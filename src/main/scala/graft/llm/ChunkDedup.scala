package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Passage-level duplication statistics (the RefinedWeb/C4-style intra-
  * corpus repeated-passage signal): split every document into consecutive
  * fixed-size token chunks and measure, per document, how many of its
  * chunks also occur in OTHER documents. High dup_chunk_frac marks mirror
  * pages, templated articles, and quote farms that document-level dedup
  * (exact or MinHash) misses because the surrounding chrome differs.
  *
  * Scale design: chunking is a narrow per-document kernel pass. Chunks
  * leave the document as (id, md5-of-chunk) pairs — 16-byte digests, never
  * chunk text — so both shuffles (the chunk document-frequency groupBy and
  * the per-doc rollup) carry slim fixed-width rows. The doc-frequency agg
  * partial-aggregates map-side, so a boilerplate chunk occurring millions
  * of times costs one row per partition in the shuffle, not one per
  * occurrence.
  *
  * Tokenization matches the corpus convention everywhere else in this
  * package: whitespace split, empty tokens dropped (Dedup.shingleSet
  * semantics). The trailing partial chunk is kept — dropping it would blind
  * the detector to short documents entirely.
  */
object ChunkDedup {

  /** Consecutive `c`-token chunk strings of one document (space-rejoined). */
  private[graft] def chunks(text: String, c: Int): Array[String] = {
    val words =
      if (text == null || text.trim.isEmpty) Array.empty[String]
      else text.trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) Array.empty
    else {
      val n = (words.length + c - 1) / c
      Array.tabulate(n) { j =>
        val from = j * c
        val until = math.min(from + c, words.length)
        val sb = new java.lang.StringBuilder(words(from))
        var i = from + 1
        while (i < until) { sb.append(' ').append(words(i)); i += 1 }
        sb.toString
      }
    }
  }

  private def chunksUdf(c: Int) = udf { (text: String) => chunks(text, c) }

  /** Overlapping retrieval chunks of one document: windows of `size`
    * tokens starting every `stride` tokens (stride < size ⇒ consecutive
    * chunks share size − stride tokens of context — the standard RAG
    * chunking rule that keeps boundary-straddling passages retrievable).
    * The tail chunk may be shorter; a start past the last token emits
    * nothing, so every token is covered and no chunk is empty.
    */
  private[graft] def overlapChunks(text: String, size: Int,
      stride: Int): Array[String] = {
    val words =
      if (text == null || text.trim.isEmpty) Array.empty[String]
      else text.trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) Array.empty
    else {
      val n = (words.length + stride - 1) / stride
      Array.tabulate(n) { j =>
        val from = j * stride
        val until = math.min(from + size, words.length)
        val sb = new java.lang.StringBuilder(words(from))
        var i = from + 1
        while (i < until) { sb.append(' ').append(words(i)); i += 1 }
        sb.toString
      }
    }
  }

  private def overlapChunksUdf(size: Int, stride: Int) =
    udf { (text: String) => overlapChunks(text, size, stride) }

  /** RAG chunking as a dataset: one row per overlapping chunk —
    * (id, chunk_idx, n_tok, chunk_md5) with chunk_idx 0-based in document
    * order. Emits the DIGEST of each chunk, not its text: the downstream
    * consumers this feeds (chunk-level dedup, embedding queues keyed by
    * digest) never need the string on the wire; callers that want text
    * re-derive it narrowly from the source row. Chunking is a narrow
    * kernel pass — no shuffle at all in this operator.
    */
  def ragChunks(df: DataFrame, id: Column, text: Column, size: Int = 32,
      stride: Int = 24): DataFrame = {
    require(size >= 1, s"ragChunks: size must be >= 1 (got $size)")
    require(stride >= 1 && stride <= size,
      s"ragChunks: stride must be in [1, size] (got $stride)")
    df.select(id.as("id"),
        posexplode(overlapChunksUdf(size, stride)(text)).as(Seq("chunk_idx", "chunk")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size_(split(col("chunk"), " ")).as("n_tok"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
  }

  // functions.size clashes with the `size`/`stride` parameter names above
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Per-document chunk duplication stats: (id, n_chunks, n_dup_chunks,
    * dup_chunk_frac) where a chunk is "duplicated" when its exact token
    * sequence occurs in ≥ 2 distinct documents. Empty documents score
    * (0, 0, 0.0).
    */
  def stats(df: DataFrame, id: Column, text: Column, c: Int = 16): DataFrame = {
    val chunked = df
      .select(id.as("id"), explode(chunksUdf(c)(text)).as("chunk"))
      .select(col("id"), md5(col("chunk").cast("binary")).as("h"))
    // document frequency per chunk digest: distinct docs, not occurrences
    val docFreq = chunked.select("h", "id").distinct()
      .groupBy("h").agg(count(lit(1)).as("_nd"))
    val perDoc = chunked
      .join(docFreq, "h")
      .groupBy("id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_nd") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
    df.select(id.as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        when(coalesce(col("n_chunks"), lit(0L)) === 0, 0d)
          .otherwise(round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6))
          .as("dup_chunk_frac"))
  }

  /** Max-length training-sequence preparation: split every document into
    * consecutive `c`-token sequences — the loader-facing sibling of
    * [[stats]] (same chunk kernel, but emitting the sequences themselves).
    * One narrow kernel pass + generator; no shuffle. Returns (id, seq_idx,
    * n_tok, seq_md5) with seq_idx 0-based in document order; token-less
    * documents produce no sequences.
    */
  def sequences(df: DataFrame, id: Column, text: Column,
      c: Int = 128): DataFrame =
    df.select(id.as("id"), posexplode(chunksUdf(c)(text)).as(Seq("seq_idx", "chunk")))
      .select(col("id"), col("seq_idx").cast("long").as("seq_idx"),
        (size(split(col("chunk"), " "))).cast("long").as("n_tok"),
        md5(col("chunk").cast("binary")).as("seq_md5"))

  /** The corpus with every duplicated chunk's LATER occurrences removed and
    * documents re-assembled (keep-first at chunk granularity, first =
    * smallest id) — the destructive form of [[stats]] used when repeated
    * passages should be excised rather than scored. Documents whose every
    * chunk was a later duplicate come back empty-text rather than vanishing:
    * row identity is the caller's to manage.
    */
  def removeDupChunks(df: DataFrame, id: Column, text: Column,
      c: Int = 16): DataFrame = {
    val chunked = df
      .select(id.as("id"), posexplode(chunksUdf(c)(text)).as(Seq("pos", "chunk")))
      .withColumn("h", md5(col("chunk").cast("binary")))
    // first (smallest-id, then smallest-pos) occurrence of each digest wins
    val winners = chunked.groupBy("h")
      .agg(min(struct(col("id"), col("pos"))).as("w"))
      .select(col("h"), col("w.id").as("_wid"), col("w.pos").as("_wpos"))
    chunked.join(winners, "h")
      .where(col("id") === col("_wid") && col("pos") === col("_wpos"))
      .groupBy("id")
      .agg(array_join(array_sort(collect_list(struct(col("pos"), col("chunk"))))
        .getField("chunk"), " ").as("text"))
  }
}
