package graft

import java.lang.management.ManagementFactory
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.SparkSession

/** Benchmark driver. Prints ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"errors":{...},"sf":...}`
  *
  * Default mode forks ONE CHILD JVM PER QUERY. Running ~100 codegen-heavy
  * queries in a single JVM contaminates later queries with the debris of
  * earlier ones — accumulated tmpfs shuffle files competing with the heap,
  * C2 recompilation churn, heap never returning to baseline — measured in
  * round 2 as 7-40x inflation (s3: 122s shared-JVM vs 7.5s isolated; t1:
  * 20.5s vs 0.6s). Per-query forking makes each number equal the query's
  * isolated steady-state cost by construction: every child runs a fixed
  * warmup (session + parquet init + target query once, untimed), then
  * times two runs and reports the min. The parent never creates a
  * SparkSession, so children are the only Spark JVM alive at any moment.
  *
  * COMPLETABILITY over redundancy (round-4 lesson): round 4's
  * fork-everything-twice policy multiplied by 104 queries blew the
  * driver's wall budget (rc=124, no artifact at all). So the parent now
  * (a) forks each query ONCE by default, spending extra forks only on
  * suspicious results (min > 3 s, or two observations disagreeing > 2x)
  * and only while the global budget has headroom for the queries still
  * unmeasured; (b) tracks a global deadline from
  * `SPARK_GRAFT_BENCH_BUDGET_SEC` (default 1500) and, when it is spent,
  * records the remaining queries as skipped rather than running over;
  * (c) registers a shutdown hook that emits whatever was measured if the
  * driver SIGTERMs the run — a partial artifact beats none.
  *
  * `SPARK_GRAFT_BENCH_MODE=inproc` restores the single-JVM mode (useful
  * for quick local iteration); `SPARK_GRAFT_BENCH_ONLY=<name>[,<name>...]`
  * runs just those queries (this is also the parent->child protocol).
  */
object Bench {

  private def sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private def cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def main(args: Array[String]): Unit = {
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "fork")
    (only, mode) match {
      case (Some(names), _) => runInProc(names, emitTotal = false)
      case (None, "inproc") => runInProc(SparkEntry.queries.keys.toSeq.sorted, emitTotal = true)
      case (None, _)        => runForked()
    }
  }

  /** Parent mode: fork a child JVM per query, sequentially (two Spark
    * JVMs benching concurrently on one host corrupt each other's numbers).
    * The child inherits this JVM's flags (heap, code cache, tmpfs
    * spark.local.dir, add-opens) and classpath, so its environment is
    * exactly the one build.sbt configures.
    *
    * Fork policy: 1 fork per query (`SPARK_GRAFT_BENCH_FORKS`), extra
    * forks up to `SPARK_GRAFT_BENCH_MAXFORKS` (default 3) only for
    * suspicious results AND only while the global budget
    * (`SPARK_GRAFT_BENCH_BUDGET_SEC`, default 1500) retains enough
    * headroom to give every not-yet-measured query its mandatory fork. */
  private def runForked(): Unit = {
    // SPARK_GRAFT_BENCH_FILTER: comma-separated names to subset the forked
    // run (local iteration only; the driver runs the full set).
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(_.contains(n)))
    val javaBin = sys.props("java.home") + "/bin/java"
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments
    val cp = sys.props("java.class.path")
    val baseForks =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_FORKS", "1").toInt)
    val maxForks =
      math.max(baseForks, sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXFORKS", "3").toInt)
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1500").toDouble
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val walls = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // If the driver SIGTERMs the run (external timeout), emit whatever
    // was measured so the round still has a performance artifact.
    val hook = new Thread(() => emitOnce(results.toSeq, errors, walls))
    Runtime.getRuntime.addShutdownHook(hook)

    // Running average of per-fork wall (JVM boot + session + warmup +
    // 2 timed runs); seeds the headroom estimate before the first fork.
    var forkWallSum = 0.0
    var forkCount = 0
    def avgForkWall: Double = if (forkCount == 0) 20.0 else forkWallSum / forkCount

    def fork(name: String): Either[String, Double] = {
      val cmd = new java.util.ArrayList[String]()
      cmd.add(javaBin)
      jvmArgs.forEach(a => cmd.add(a))
      cmd.add("-cp"); cmd.add(cp); cmd.add("graft.Bench")
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", name)
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line: String = null
      var last: String = null
      while ({ line = out.readLine(); line != null }) {
        if (line.startsWith("""{"query":""")) last = line
      }
      // A hung query must not eat the whole budget: cap each fork at the
      // remaining global budget (min 60 s), never more than 10 min.
      val capSec = math.min(600.0, math.max(60.0, budgetSec - elapsed))
      val finished = proc.waitFor(capSec.toLong, TimeUnit.SECONDS)
      if (!finished) {
        proc.destroy() // SIGTERM first so the child's Spark stops cleanly
        if (!proc.waitFor(10, TimeUnit.SECONDS)) proc.destroyForcibly()
        Left(f"timeout after $capSec%.0f s")
      }
      else if (last == null) Left(s"child exited ${proc.exitValue()} without result")
      else parseChildLine(last)
    }

    names.zipWithIndex.foreach { case (name, i) =>
      val remaining = names.size - i - 1 // queries still owed a mandatory fork
      if (elapsed + avgForkWall > budgetSec + 120.0) {
        // Budget (plus small grace) fully spent: record and move on rather
        // than dying mid-run with nothing.
        errors(name) = "skipped: bench budget exhausted"
      } else {
        val obs = scala.collection.mutable.ArrayBuffer[Double]()
        var lastErr: Option[String] = None
        var wall = 0.0
        var n = 0
        // Extra forks beyond the first are a luxury: spend one only when
        // the result is suspicious (this VM has a documented transient-
        // degradation mode — identical queries measured 7 s and 114 s in
        // fresh JVMs — so a slow single observation may be a degradation
        // window, not the query's true cost) AND the global budget can
        // still afford the mandatory fork of every remaining query.
        def suspicious: Boolean = obs.sorted.toList match {
          case best :: rest =>
            best > 3.0 && (rest.isEmpty || rest.head > 2.0 * best)
          case _ => true // only errors so far: retry up to the cap
        }
        def headroom: Boolean =
          budgetSec - elapsed > avgForkWall * (remaining + 1)
        while (n < baseForks || (n < maxForks && suspicious && headroom)) {
          val w0 = System.nanoTime()
          val r = fork(name)
          val dw = (System.nanoTime() - w0) / 1e9
          wall += dw; forkWallSum += dw; forkCount += 1
          n += 1
          r match {
            case Right(sec) =>
              obs += sec
              System.err.println(f"[bench] $name fork $n/$maxForks: $sec%.3f s (wall ${elapsed}%.0f/${budgetSec}%.0f)")
            case Left(err) =>
              lastErr = Some(err)
              System.err.println(s"[bench] $name fork $n/$maxForks FAILED: $err")
          }
        }
        walls(name) = wall
        if (obs.nonEmpty) results(name) = obs.min
        else errors(name) = lastErr.getOrElse("no observation")
      }
    }
    emitOnce(results.toSeq, errors, walls)
    try Runtime.getRuntime.removeShutdownHook(hook) catch { case _: IllegalStateException => () }
  }

  /** Minimal parser for the child's single-result line — the child emits
    * `{"query":"<name>","sec":<n>}` or `{"query":"<name>","err":"<msg>"}`
    * with no nesting, so a regex is sufficient (no JSON lib on the
    * classpath beyond Spark's shaded ones). */
  private def parseChildLine(line: String): Either[String, Double] = {
    val sec = """"sec":([0-9.eE+-]+)""".r.findFirstMatchIn(line).map(_.group(1).toDouble)
    val err = """"err":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(line)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    sec.map(Right(_)).orElse(err.map(Left(_))).getOrElse(Left(s"unparseable: $line"))
  }

  /** Child / inproc mode: run the given queries in this JVM. In child
    * mode (emitTotal=false, single query) prints a per-query result line;
    * in inproc mode prints the aggregate line. */
  private def runInProc(names: Seq[String], emitTotal: Boolean): Unit = {
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
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      // Untimed warmup: one full run of the target query covers session +
      // parquet init AND this query's codegen/JIT, so the timed runs
      // measure steady-state cost. (No separate cross-query warmup — it
      // cost ~2-3 s per fork and the target's own run subsumes it.)
      try {
        fn(spark, sfDir).count()
        release(spark)
      } catch { case _: Throwable => () }
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        release(spark)
        dt
      }
      if (!emitTotal) {
        if (errors.contains(name))
          println(s"""{"query":${jstr(name)},"err":${jstr(errors(name))}}""")
        else
          println(s"""{"query":${jstr(name)},"sec":${times.min}}""")
      }
      name -> times.min
    }
    if (emitTotal) emit(results, errors)
    spark.stop()
  }

  /** Free cross-query state: cached tables plus localCheckpoint blocks
    * (NOT covered by clearCache; they otherwise accumulate until GC and
    * degrade later queries sharing the JVM). */
  private def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  private def jstr(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  @volatile private var emitted = false

  /** Emit-at-most-once wrapper shared by the normal exit path and the
    * SIGTERM shutdown hook, so a killed run still prints one parseable
    * (partial) artifact and a normal run never prints two. */
  private def emitOnce(results: Seq[(String, Double)],
      errors: scala.collection.Map[String, String],
      walls: scala.collection.Map[String, Double]): Unit = synchronized {
    if (!emitted) {
      emitted = true
      emit(results, errors, walls)
      System.out.flush()
    }
  }

  /** Emits the single aggregate JSON line. `"queries"` stays a flat
    * name->seconds map (the driver's parse contract); per-query fork
    * wall-clock (child JVM boot + warmup + timed runs, summed over all
    * forks) rides in the sibling `"wall"` key so the timed-query vs
    * harness-overhead split is diagnosable from the artifact alone. */
  private def emit(results: Seq[(String, Double)],
      errors: scala.collection.Map[String, String],
      walls: scala.collection.Map[String, Double] = Map.empty): Unit = {
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val wallJson = walls.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"wall":$wallJson,"sf":"$sfDir"}""")
  }
}
