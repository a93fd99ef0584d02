package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the versioning primitive of an evolving
  * training corpus: given two snapshots keyed by document id, classify
  * every id as added / removed / changed / unchanged by content digest.
  * This is how incremental pipelines decide what to re-process (changed ∪
  * added) and how dataset cards report churn between releases.
  *
  * Scale design: each side reduces to (id, 16-byte md5) before the join —
  * payload text never enters the shuffle — and the full-outer join is a
  * sort-merge on the id key, the plan shape that survives two 100 TB
  * snapshots. No driver-side state.
  */
object Snapshot {

  /** Full-outer diff of two snapshots: (id, status) for every id present
    * in either snapshot, status ∈ added | removed | changed | unchanged
    * (relative to `oldDf` → `newDf`).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, id: Column,
      payload: Column): DataFrame = {
    val o = oldDf.select(id.as("_snap_id"), md5(payload.cast("binary")).as("_old_h"))
    val n = newDf.select(id.as("_snap_id"), md5(payload.cast("binary")).as("_new_h"))
    o.join(n, Seq("_snap_id"), "full_outer")
      .select(col("_snap_id").as("id"),
        when(col("_old_h").isNull, "added")
          .when(col("_new_h").isNull, "removed")
          .when(col("_old_h") =!= col("_new_h"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** MERGE / upsert — [[diff]]'s inverse: apply a change feed to a base
    * snapshot to produce the next release. `changes` shares the base
    * schema plus an `opCol` ∈ {"upsert", "delete"}: upsert replaces (or
    * adds) the row with that id, delete removes it; base rows with no
    * change pass through. A duplicate id within one change feed is a
    * malformed feed — callers dedupe upstream; this operator asserts
    * nothing and unions whatever survives the anti-join.
    *
    * Scale shape: the touched-id set is a slim distinct projection; the
    * anti-join is one keyed shuffle of (id)-only rows against the base
    * (broadcast when the feed is small — the common case: daily churn ≪
    * corpus), and the union is shuffle-free. The payload never shuffles on
    * the base side — the anti-join carries base rows untouched.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, idCol: String,
      opCol: String): DataFrame = {
    val touched = changes.select(col(idCol)).distinct()
    base.join(touched, Seq(idCol), "left_anti")
      .unionByName(changes.where(col(opCol) === "upsert").drop(opCol))
  }
}
