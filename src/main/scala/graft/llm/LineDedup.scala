package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide duplicated-line removal (the RefinedWeb / Falcon "line
  * dedup" stage): split every document into lines, count each distinct
  * line across the WHOLE corpus, strip the lines that occur more than
  * `maxOccur` times (boilerplate: nav bars, license headers, cookie
  * banners), and reassemble the surviving text in original order.
  *
  * Scale design — the shuffles never carry text:
  *  1. line counting groups on md5(line) after map-side partial
  *     aggregation, so the exchange rows are (16-byte digest, count);
  *  2. the over-threshold digest set joins back to the exploded lines
  *     as a LEFT ANTI on the digest (no payload on the build side);
  *  3. reassembly groups only (doc_id, pos) int pairs per document and
  *     rebuilds the kept text by re-slicing the document's own line
  *     array — the line strings themselves never enter an exchange.
  * At 100 TB: two digest-size shuffles + one (id, int-list) shuffle
  * bounded by lines-per-doc, all partial-aggregated.
  *
  * Lines come from a caller-supplied splitter so the same operator
  * serves real newline-delimited text (`split(text, "\n")`) and the
  * fixture's unpunctuated word-stream (fixed word windows via
  * [[wordWindows]]).
  */
object LineDedup {

  /** Non-overlapping w-word windows of the whitespace token stream — the
    * "lines" of a text corpus that has no newlines. Column-algebra
    * reference form: correct, but the lambda body re-evaluates the
    * `split` subtree per generated window (Catalyst does not CSE into a
    * HOF lambda), which measured ~10 s at sf0.1. Use [[wordWindows]]
    * (single-pass kernel, spec-pinned equivalent) in real plans.
    */
  def wordWindowsAlgebra(text: Column, w: Int): Column = {
    val toks = TextStats.tokens(text)
    val nWin = ceil(size(toks).cast("double") / w).cast("int")
    when(size(toks) === 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), nWin - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
  }

  /** Kernel form of [[wordWindowsAlgebra]]: one scan — trim (0x20 only,
    * Spark `trim` semantics), `\s+` split with limit -1 (trailing empty
    * tokens kept, like the column `split`), then group w tokens per
    * window. O(doc length) per row, no re-evaluation.
    */
  def wordWindows(text: Column, w: Int): Column = {
    val u = udf { (t: String) =>
      if (t == null) Array.empty[String]
      else {
        val s = org.apache.spark.unsafe.types.UTF8String.fromString(t)
          .trim.toString
        if (s.isEmpty) Array.empty[String]
        else {
          val toks = s.split("\\s+", -1)
          val out = new Array[String]((toks.length + w - 1) / w)
          var i = 0
          while (i < out.length) {
            val from = i * w
            val until = math.min(from + w, toks.length)
            val sb = new java.lang.StringBuilder()
            var j = from
            while (j < until) {
              if (j > from) sb.append(' ')
              sb.append(toks(j))
              j += 1
            }
            out(i) = sb.toString
            i += 1
          }
          out
        }
      }
    }
    u(text)
  }

  /** Per-document dedup summary: (id, n_lines, n_kept, kept_md5) where
    * kept_md5 digests the space-rejoined surviving lines (md5('') for
    * documents whose every line was boilerplate). `lines` must be an
    * array<string> column.
    */
  def dedupLines(df: DataFrame, id: Column, lines: Column,
      maxOccur: Int): DataFrame = {
    val base = df.select(id.as("id"), lines.as("lines"))
    val exploded = base.select(col("id"),
        posexplode(col("lines")).as(Seq("pos", "line")))
      .select(col("id"), col("pos"), md5(col("line").cast("binary")).as("h"))
    val dupDigests = exploded.groupBy("h")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > maxOccur)
      .select("h")
    // ANTI join on the digest: surviving (id, pos) pairs only
    val keptPos = exploded.join(dupDigests, Seq("h"), "left_anti")
      .groupBy("id")
      .agg(sort_array(collect_list(col("pos"))).as("keep_pos"))
    base.join(keptPos, Seq("id"), "left")
      .select(
        col("id"),
        size(col("lines")).as("n_lines"),
        coalesce(size(col("keep_pos")), lit(0)).as("n_kept"),
        md5(array_join(
          transform(coalesce(col("keep_pos"), array().cast("array<int>")),
            p => element_at(col("lines"), p + 1)),
          " ").cast("binary")).as("kept_md5"))
  }
}
