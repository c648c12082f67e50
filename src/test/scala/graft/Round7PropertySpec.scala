package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-correctness properties for the round-7 closures — the
  * StatefulCadence monotone-state guard gets the same cross-micro-batch
  * partition-invariance property its batch twins have: failures are
  * reproducible from the printed seed.
  */
class Round7PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("round7-prop")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  /** Random per-user event sets with equal-timestamp ties (exercising
    * the (t_us, event_id) tiebreak) as (user_id, event_id, ts). */
  private def randomEvents(rnd: Random): Seq[(Long, Long, java.sql.Timestamp)] = {
    var eid = 0L
    (1L to 5L).flatMap { u =>
      val n = 5 + rnd.nextInt(16)
      (1 to n).map { _ =>
        eid += 1
        // second-granularity offsets with deliberate collisions
        val sec = rnd.nextInt(600)
        (u, eid, new java.sql.Timestamp(1704067200000L + sec * 1000L))
      }
    }
  }

  test("stateful cadence is invariant to micro-batch cuts and replayed duplicates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulCadence
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val events = randomEvents(rnd)
      // the stream contract: events arrive in global (t_us, event_id)
      // order; HOW they are cut into micro-batches is arbitrary
      val ordered = events.sortBy(e => (e._3.getTime, e._2))
      // random cut points -> 1..8 micro-batches
      val nCuts = rnd.nextInt(8)
      val cuts = (Seq(0, ordered.size) ++
        Seq.fill(nCuts)(rnd.nextInt(ordered.size + 1))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => ordered.slice(a, b) }

      val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val q = StatefulCadence.cadence(mem.toDF.toDF("user_id", "event_id", "ts"))
        .writeStream.format("memory").queryName(s"cadprop$seed")
        .outputMode("update").start()
      try {
        var delivered = Vector.empty[(Long, Long, java.sql.Timestamp)]
        batches.foreach { b =>
          if (b.nonEmpty) {
            // replayed duplicates: re-deliver a random sample of events
            // ALREADY FOLDED in earlier batches alongside the new ones —
            // the monotone (last_us, last_id) guard must skip them
            val replays = rnd.shuffle(delivered).take(rnd.nextInt(4))
            mem.addData(rnd.shuffle(b ++ replays))
            q.processAllAvailable()
            delivered ++= b
          }
        }
        // final state per user = the row with the largest n_gaps
        // (update mode re-emits; a replay-only touch re-emits the same row)
        val fin = spark.table(s"cadprop$seed").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
          .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
        // batch twin on the deduplicated event set
        val ev = events.toDF("user_id", "event_id", "ts")
        val batch = graft.operators.Sessions.interEventStats(ev).collect()
          .map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
          .toMap
        assert(fin === batch, s"seed=$seed cuts=$cuts")
        assert(fin.nonEmpty, s"seed=$seed produced no rows")
      } finally q.stop()
    }
  }

  test("stateful cadence skips a NEW event that arrives behind the fold point") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulCadence
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    // deliver (id=1, t=0s), (id=3, t=30s); then a NEW id=2 at t=10s —
    // behind (last_us, last_id) — in a later micro-batch. The guard
    // skips it: the state must stay exactly the two-event cadence
    // (one 30 s gap), never a rewound or inflated one.
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StatefulCadence.cadence(mem.toDF.toDF("user_id", "event_id", "ts"), minGaps = 1)
      .writeStream.format("memory").queryName("cadlate")
      .outputMode("update").start()
    try {
      mem.addData((1L, 1L, t("2024-01-01 00:00:00")), (1L, 3L, t("2024-01-01 00:00:30")))
      q.processAllAvailable()
      mem.addData((1L, 2L, t("2024-01-01 00:00:10"))) // straggler: skipped
      q.processAllAvailable()
      val fin = spark.table("cadlate").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(fin(1L) === ((1L, 1L, 30L, 30L)))
    } finally q.stop()
  }
}
