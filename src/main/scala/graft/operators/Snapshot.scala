package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit step between two versions of a
  * curated dataset: which documents were added, removed, changed, or
  * left untouched. Every training-data release pipeline runs this
  * before shipping version N+1 (and the status counts are the headline
  * of the release note).
  *
  * Plan shape at 100 TB: each snapshot is projected to (id, 64-bit
  * content hash) IN THE SCAN STAGE, so only 16-byte rows cross the
  * wire for the full-outer equi-join on the id — the join shuffles
  * both sides once on the id key (neither side of a corpus-sized diff
  * is broadcastable, so co-partitioned shuffle is the right shape).
  * "Changed" is hash-inequality: a 64-bit xxhash collision would
  * misreport a changed doc as unchanged with probability ~2⁻⁶⁴ per
  * pair — the standard trade for not shuffling document bodies.
  */
object Snapshot {

  /** Row-level diff: (idCol, status) with status ∈ added | removed |
    * changed | unchanged. `added`/`removed` are from the NEW snapshot's
    * perspective. */
  def diff(
      oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id", contentCol: String = "text"): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      xxhash64(col(contentCol)).as("_h_old"))
    val n = newSnap.select(col(idCol).as("id"),
      xxhash64(col(contentCol)).as("_h_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("_h_old").isNull, "added")
          .when(col("_h_new").isNull, "removed")
          .when(col("_h_old") =!= col("_h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** One-row release-note summary of [[diff]]. */
  def report(
      oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id", contentCol: String = "text"): DataFrame = {
    diff(oldSnap, newSnap, idCol, contentCol).agg(
      count(when(col("status") === "added", 1)).as("added"),
      count(when(col("status") === "removed", 1)).as("removed"),
      count(when(col("status") === "changed", 1)).as("changed"),
      count(when(col("status") === "unchanged", 1)).as("unchanged"))
  }
}
