package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Materialization layout for the STATIC side of iterative join loops
  * (CC edges, the PageRank out-weighted edge table, the LPA/harmonic
  * neighbor tables, the HITS edge table): consumed once per iteration,
  * always joined on the same key.
  *
  * Two regimes (the round-13/14 pinned-layout measurements):
  *
  *  - `checkpoint` (default): `localCheckpoint()` — eager, lineage-cut,
  *    but reports UnknownPartitioning. At bench scale this WINS: the
  *    per-iteration small side (ranks/labels, |V| rows) broadcasts, so
  *    the static side is never exchanged anyway, AQE coalesces the tiny
  *    shuffles, and a pinned cache would only add its build cost
  *    (measured regressions at sf0.1 in BOTH rounds).
  *  - `pinned`: `repartition(shuffle.partitions, key).persist()`,
  *    eagerly materialized — the layout stays visible to the planner,
  *    so each iteration's join exchanges ONLY the |V|-row side. This is
  *    the production shape once |V| outgrows the broadcast threshold
  *    (at 100 TB the rank/label side cannot broadcast and the static
  *    side would otherwise re-exchange every round). Selected via
  *    `spark.graft.staticLayout=pinned`; see OPTIMIZATION_r14.md for
  *    the forced-shape (autoBroadcastJoinThreshold=-1) sf1 A/B that
  *    decides the production value.
  *
  * The conf is read per call so a session owns the decision; the local
  * default keeps the driver's bench byte-identical to the checkpoint
  * plans. */
private[graft] object StaticLayout {

  def static(df: DataFrame, keys: Column*): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.staticLayout") match {
      case Some("pinned") if keys.nonEmpty =>
        val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        val p = df.repartition(n, keys: _*).persist()
        p.count() // eager: a lazy cache races its own consumers (r7 lesson)
        p
      case _ => df.localCheckpoint()
    }
}
