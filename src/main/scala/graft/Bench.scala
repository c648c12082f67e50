package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.registerAll(spark)
    // Untimed warmup: absorbs JVM/codegen/session startup so per-query
    // numbers measure the queries, not the first-run tax. The dedup
    // pipelines are warmed on a tiny slice — their tokenize/minhash/join
    // codegen otherwise lands entirely on the first heavy query.
    try {
      import org.apache.spark.sql.functions.col
      SparkEntry.queries("q2_global_agg")(spark, sfDir).count()
      val docs = SparkEntry.tbl(spark, sfDir, "documents")
        .limit(200).select(col("doc_id"), col("text"))
      graft.operators.Dedup.minhashLshPairs(docs).count()
      graft.operators.Dedup.ngramJaccardPairs(docs, n = 5).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    } catch { case _: Throwable => () }
    // Two timed runs per query, min reported: measures steady-state cost,
    // not JIT/codegen-compilation noise of whichever query runs first.
    // Failures are recorded explicitly (a swallowed exception would
    // otherwise report a plausible-looking duration for a broken query).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators materialize reused intermediates via localCheckpoint;
        // those blocks are NOT covered by clearCache() and otherwise
        // accumulate until GC, degrading later queries in the run
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        dt
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
