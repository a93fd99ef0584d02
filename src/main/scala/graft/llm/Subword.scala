package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy longest-prefix subword tokenization (the WordPiece/BPE-apply
  * step): each word is segmented left-to-right, always taking the longest
  * vocabulary piece that prefixes the remaining suffix. This is the
  * "apply the trained tokenizer" stage that closes the tokenizer-prep
  * family ([[Vocab]] trains the vocab / counts BPE merge pairs; this
  * segments the corpus with it).
  *
  * Scale design: the piece vocabulary is driver-bounded by construction
  * (a tokenizer vocab — tens of thousands of entries at most) and is
  * broadcast as a set; segmentation is one narrow kernel pass per
  * document emitting (piece, count) pairs bounded by the vocab size, so
  * the only shuffle is the final piece-count aggregation — at most
  * |vocab| rows per partition after map-side partial aggregation,
  * independent of corpus size.
  *
  * Determinism: at a given (word, position) the candidate piece of each
  * length is the substring itself, so "longest match" is unambiguous; a
  * character not covered by the vocab is emitted as a single-char piece
  * (guaranteed progress, same rule in the SQL oracle).
  */
object Subword {

  /** Greedy longest-prefix segmentation of one word. */
  private[graft] def tokenizeWord(word: String, vocab: Set[String],
      maxPiece: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      var len = math.min(maxPiece, word.length - pos)
      var found: String = null
      while (found == null && len > 1) {
        val cand = word.substring(pos, pos + len)
        if (vocab.contains(cand)) found = cand else len -= 1
      }
      if (found == null) found = word.substring(pos, pos + 1)
      out += found
      pos += found.length
    }
    out.result()
  }

  /** Corpus-wide piece frequencies: (piece, cnt), descending with piece
    * tie-break, truncated to `topN`. Tokenization of the text column
    * follows the [[Vocab.tokenIds]] kernel contract (UTF8String
    * lower/trim, `\s+` split with limit -1) so the word stream is
    * identical to the column-algebra form.
    */
  def pieceCounts(df: DataFrame, text: Column, vocab: Seq[String],
      topN: Int): DataFrame = {
    val maxPiece = vocab.map(_.length).max
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toSet)
    val kernel = udf { (t: String) =>
      if (t == null) Array.empty[(String, Long)]
      else {
        val s = org.apache.spark.unsafe.types.UTF8String.fromString(t)
          .toLowerCase.trim.toString
        if (s.isEmpty) Array.empty[(String, Long)]
        else {
          val counts = scala.collection.mutable.HashMap.empty[String, Long]
          s.split("\\s+", -1).foreach { w =>
            if (w.nonEmpty) tokenizeWord(w, bc.value, maxPiece).foreach { p =>
              counts.update(p, counts.getOrElse(p, 0L) + 1L)
            }
          }
          counts.toArray
        }
      }
    }
    df.select(explode(kernel(text)).as("pc"))
      .groupBy(col("pc._1").as("piece"))
      .agg(sum(col("pc._2")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topN)
  }

  /** Tokenizer fertility (pieces per word) by group (e.g. language):
    * (group, n_words, n_pieces, fertility). One kernel pass emits a
    * (words, pieces) pair per document; the aggregation shuffles one
    * 2-long row per document, partial-aggregated to |groups| rows.
    */
  def fertilityByGroup(df: DataFrame, group: Column, text: Column,
      vocab: Seq[String]): DataFrame = {
    val maxPiece = vocab.map(_.length).max
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toSet)
    val kernel = udf { (t: String) =>
      if (t == null) (0L, 0L)
      else {
        val s = org.apache.spark.unsafe.types.UTF8String.fromString(t)
          .toLowerCase.trim.toString
        if (s.isEmpty) (0L, 0L)
        else {
          var words = 0L
          var pieces = 0L
          s.split("\\s+", -1).foreach { w =>
            if (w.nonEmpty) {
              words += 1
              pieces += tokenizeWord(w, bc.value, maxPiece).length
            }
          }
          (words, pieces)
        }
      }
    }
    df.select(group.as("lang"), kernel(text).as("wp"))
      .groupBy("lang")
      .agg(sum(col("wp._1")).as("n_words"), sum(col("wp._2")).as("n_pieces"))
      .select(col("lang"), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words"), 4).as("fertility"))
  }
}
