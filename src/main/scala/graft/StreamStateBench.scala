package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State-size measurement for [[graft.streaming.StreamingNearDup]]'s
  * two verify modes — the number the scaladoc's "~|shingles|/k state
  * cut" claim rests on: run the same admission stream through the gate
  * with exact (shingle-set) state and with signature-only state, and
  * report the stateful operator's own metrics (rows + bytes) per
  * admitted document, plus per-batch wall.
  *
  * Output: one JSON line per mode —
  * `{"metric":"neardup_state","mode":…,"docs":N,"flagged":F,
  *   "state_rows":R,"state_bytes":B,"bytes_per_doc":…,"sec":…}`.
  *
  * Run: `sbt "runMain graft.StreamStateBench [nDocs] [batches]"`.
  */
object StreamStateBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(10000)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = Graft.localSession("stream-state-bench",
      shufflePartitions = 8)
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    // deterministic corpus + stream: word salads with some shared
    // vocabulary so band buckets get real (multi-member) occupancy.
    // 50021 is prime (and coprime to 37), so two ids collide only when
    // they differ by 50021 — beyond the id range: the only duplicates
    // are the planted copies
    def doc(i: Long): String =
      (0 until 60).map(w => s"w${(i * 37 + w * w) % 50021}_${w % 13}")
        .mkString(" ")
    val corpus = (0L until 500L).map(i => (i, doc(i)))
      .toDF("doc_id", "text").localCheckpoint()
    val (cSh, cBands) = graft.operators.Dedup.nearDupManifest(corpus)
    val incoming = (1000L until 1000L + nDocs)
      .map(i => (i, doc(i))) ++
      // 5% exact copies of earlier stream docs — some state hits
      (0L until nDocs / 20L).map(j => (1000L + nDocs + j, doc(1000L + j * 20)))
    val parts = incoming.grouped(
      (incoming.size + nBatches - 1) / nBatches).toSeq

    Seq(false, true).foreach { sigMode =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val mem = MemoryStream[(Long, String)]
      val name = if (sigMode) "ss_sig" else "ss_exact"
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingNearDup
        .flaggedIds(mem.toDF.toDF("doc_id", "text"), cSh, cBands,
          signatureState = sigMode)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        parts.foreach { p => mem.addData(p: _*); q.processAllAvailable() }
        val sec = (System.nanoTime() - t0) / 1e9
        val flagged = spark.table(name).count()
        // the flatMapGroupsWithState operator is the bucket state; the
        // downstream dropDuplicates is flagged-only (tiny, reported too)
        val ops = q.lastProgress.stateOperators
        val fold = ops.find(_.operatorName.contains("flatMapGroupsWithState")).get
        val dedup = ops.find(_.operatorName.toLowerCase.contains("dedupe"))
        println(f"""{"metric":"neardup_state","mode":"${if (sigMode) "signature" else "exact"}","docs":${incoming.size},"flagged":$flagged,"state_rows":${fold.numRowsTotal},"state_bytes":${fold.memoryUsedBytes},"bytes_per_doc":${fold.memoryUsedBytes.toDouble / incoming.size}%.1f,"dedup_state_rows":${dedup.map(_.numRowsTotal).getOrElse(-1L)},"sec":$sec%.1f}""")
      } finally q.stop()
    }
    spark.stop()
  }
}
