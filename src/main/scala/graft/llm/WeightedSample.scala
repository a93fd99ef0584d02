package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement (Efraimidis &
  * Spirakis 2006, "Weighted random sampling with a reservoir"): each row
  * draws a stable pseudo-uniform u from md5 of its id and is ranked by
  * key = ln(u) / w — the top-n rows by key are exactly an A-ES weighted
  * sample, but reproducible across reruns and partition layouts because
  * the randomness is a pure function of the ids (same contract as
  * [[Shuffle.order]]).
  *
  * Scale design: the key is one codegen'd projection; selection is a
  * TakeOrderedAndProject (per-partition top-n + driver merge of n×P
  * rows), never a global sort. n must be driver-bounded (it's a sample).
  */
object WeightedSample {

  /** 32-bit md5-derived uniform in (0, 1]: the first 8 hex digits of
    * md5(id) as an integer v, mapped to (v+1)/2^32. Shared derivation
    * with the DuckDB oracle (`('0x' || substr(md5(id),1,8))::UBIGINT`).
    */
  def uniformFromId(id: Column): Column =
    ((conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") + 1d) / pow(lit(2d), lit(32d)))

  /** A-ES sampling key ln(u)/w (monotone in u^(1/w); larger is better).
    * `w` must be strictly positive.
    */
  def key(id: Column, w: Column): Column =
    log(uniformFromId(id)) / w

  /** Top-n weighted sample: (id, w, skey) with skey the 9-dp-rounded
    * sampling key, ranked descending with id tie-break.
    */
  def sample(df: DataFrame, id: Column, w: Column, n: Int): DataFrame =
    df.select(id.as("id"), w.cast("double").as("w"),
        round(key(id, w.cast("double")), 9).as("skey"))
      .orderBy(col("skey").desc, col("id"))
      .limit(n)
}
