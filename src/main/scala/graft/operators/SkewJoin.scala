package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for pathological key skew. AQE's skew-join split
  * handles moderate skew after the fact; when one key owns a double-digit
  * percentage of a 100 TB fact table (the "null island" geometry, the
  * empty-string domain), pre-salting is the deterministic fix: replicate
  * the (small) build side `salt` ways and scatter each fact row to one
  * replica by a per-row hash, so the hot key's rows spread across `salt`
  * reducers instead of one straggler task.
  *
  * Result-identical to the plain inner join — the salt column is an
  * internal fan-out detail that never changes which (fact, dim) pairs
  * meet. The q_skew_join oracle is the PLAIN SQL join for exactly that
  * reason.
  */
object SkewJoin {

  /** Inner equi-join of `facts` to `dim` on `key` (a column present on
    * both sides), with `dim` replicated `salt` ways and each fact row
    * routed by `saltBy` — any deterministic per-row expression with
    * reasonable spread (a unique id hash; NOT the join key itself).
    *
    * Scale guard: replication multiplies the dim side's rows AND its
    * per-executor memory footprint (measured: salt=8 on a modest dim is
    * fine at 8 GiB heap but was the round-6 bench's most heap-sensitive
    * plan). `dim` is counted up front — one cheap scan of the SMALL side
    * by contract — and when `dimRows * salt` exceeds
    * `maxReplicatedRows`, the operator degrades to the plain equi-join
    * and lets AQE's runtime skew-split handle the hot keys instead of
    * replicating a dim that was never broadcast-sized. Both paths are
    * result-identical (the salt column never changes which (fact, dim)
    * pairs meet), so the degradation is a pure plan choice.
    */
  def salted(facts: DataFrame, dim: DataFrame, key: String,
      saltBy: Column, salt: Int = 8,
      maxReplicatedRows: Long = 50L * 1000 * 1000): DataFrame = {
    require(salt > 0, "salt must be positive")
    val dimRows = dim.count()
    if (dimRows * salt > maxReplicatedRows) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"SkewJoin: dim has $dimRows rows; x$salt replication exceeds " +
          s"$maxReplicatedRows — falling back to the plain join (AQE skew split)")
      facts.join(dim, Seq(key))
    } else {
      val dimRep = dim.withColumn("_salt",
        explode(lit((0 until salt).toArray)))
      val factsSalted = facts.withColumn("_salt",
        pmod(saltBy, lit(salt.toLong)).cast("int"))
      factsSalted.join(dimRep, Seq(key, "_salt")).drop("_salt")
    }
  }
}
