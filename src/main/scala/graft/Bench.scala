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
  * driver's wall budget (rc=124, no artifact at all), and even single
  * per-query forks cost ~19 s of boot each (105 × 19 ≈ 2,000 s). So the
  * parent now (a) measures queries in small GROUPS per child JVM
  * (amortizing boot) and re-forks only suspicious observations
  * isolated; (b) tracks a global deadline from
  * `SPARK_GRAFT_BENCH_BUDGET_SEC` (default 1250 — under the driver's
  * ~1,400 s kill with emit-tail slack) and, when it is spent,
  * records the remaining queries as skipped rather than running over;
  * (c) registers a shutdown hook that emits whatever was measured if the
  * driver SIGTERMs the run — a partial artifact beats none. See
  * [[runForked]] for the two-pass policy.
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

  /** Parent mode: fork child JVMs sequentially (two Spark JVMs benching
    * concurrently on one host corrupt each other's numbers). The child
    * inherits this JVM's flags (heap, code cache, tmpfs spark.local.dir,
    * add-opens) and classpath, so its environment is exactly the one
    * build.sbt configures.
    *
    * Fork policy — two passes:
    *  1. GROUP pass: queries run in fresh child JVMs of
    *     `SPARK_GRAFT_BENCH_GROUP` (default 9) queries each, with
    *     cached/checkpointed state released between queries. This
    *     amortizes the ~10-15 s JVM-boot + session + parquet-init cost
    *     that made one-JVM-per-query unaffordable at 100+ queries
    *     (105 × ~19 s ≈ 2,000 s vs the ~1,500 s wall budget). Groups
    *     are small and short-lived, so the round-2 shared-JVM
    *     contamination (30+ heavy queries in ONE JVM inflating later
    *     ones 7-40×) cannot accumulate.
    *  2. CONFIRM pass: any query whose group observation is suspicious
    *     (> 3 s — possibly group debris or this VM's documented
    *     transient-degradation windows) is re-forked ISOLATED, up to
    *     `SPARK_GRAFT_BENCH_MAXFORKS` (default 3) total observations
    *     while they disagree > 2×, and the min is recorded. Isolated
    *     min-of-honest-runs equals the per-query-fork fidelity of the
    *     old design exactly where it matters.
    * Both passes respect the global `SPARK_GRAFT_BENCH_BUDGET_SEC`
    * deadline (default 1250): when it is spent, remaining work is
    * recorded as skipped and whatever was measured is emitted. A
    * shutdown hook emits the partial artifact if the driver SIGTERMs
    * the run. */
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
    val group =
      // 9 per child at 200+ queries: the round-6 dress rehearsal hit
      // 1,226 s of the 1,250 s budget at group=6 (~34 JVM boots); fewer
      // boots buy the wall headroom new queries need, and the >3 s
      // suspicious-observation re-fork keeps shared-JVM inflation out
      // of the recorded numbers either way
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_GROUP", "9").toInt)
    val maxForks =
      math.max(2, sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXFORKS", "3").toInt)
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1250").toDouble
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val walls = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // All three maps are mutated by the fork loop and read by the
    // shutdown hook, which runs CONCURRENTLY with it on SIGTERM —
    // unsynchronized LinkedHashMap iteration mid-insert can throw and
    // kill the very partial-artifact emit the hook exists for. Every
    // mutation and the hook's snapshot share the object monitor
    // (emitOnce's lock).
    def record(f: => Unit): Unit = synchronized(f)
    def snapshot(): (Seq[(String, Double)], Map[String, String], Map[String, Double]) =
      synchronized((results.toSeq, errors.toMap, walls.toMap))
    // If the driver SIGTERMs the run (external timeout), emit whatever
    // was measured so the round still has a performance artifact.
    val hook = new Thread(() => {
      val (r, e, w) = snapshot()
      emitOnce(r, e, w)
    })
    Runtime.getRuntime.addShutdownHook(hook)

    /** Forks one child JVM over `qs`, returns per-query results. */
    def fork(qs: Seq[String]): Map[String, Either[String, Double]] = {
      val cmd = new java.util.ArrayList[String]()
      cmd.add(javaBin)
      jvmArgs.forEach(a => cmd.add(a))
      cmd.add("-cp"); cmd.add(cp); cmd.add("graft.Bench")
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", qs.mkString(","))
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      // Drain stdout on a daemon thread: a blocking readLine loop on the
      // parent thread would hang forever on a wedged child and the fork
      // timeout below would never fire (results already printed would
      // also be lost). The reader exits when the child's stdout closes —
      // including after a destroy().
      val got = new java.util.concurrent.ConcurrentHashMap[String, Either[String, Double]]()
      val reader = new Thread(() => {
        val out = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        try {
          var line: String = null
          while ({ line = out.readLine(); line != null }) {
            if (line.startsWith("""{"query":"""))
              parseChildLine(line).foreach { case (n, r) => got.put(n, r) }
          }
        } catch { case _: java.io.IOException => () }
      })
      reader.setDaemon(true)
      reader.start()
      // A hung child must not eat the whole budget: cap each fork at the
      // remaining global budget (min 60 s), never more than 10 min.
      val capSec = math.min(600.0, math.max(60.0, budgetSec - elapsed))
      val finished = proc.waitFor(capSec.toLong, TimeUnit.SECONDS)
      if (!finished) {
        proc.destroy() // SIGTERM first so the child's Spark stops cleanly
        if (!proc.waitFor(10, TimeUnit.SECONDS)) proc.destroyForcibly()
      }
      reader.join(5000)
      qs.map { n =>
        n -> Option(got.get(n)).getOrElse(
          Left(if (finished) s"child exited ${proc.exitValue()} without result"
               else f"timeout after $capSec%.0f s (partial results kept)"))
      }.toMap
    }

    // ── pass 1: grouped measurement ──────────────────────────────────
    val groups = names.grouped(group).toSeq
    groups.zipWithIndex.foreach { case (qs, gi) =>
      if (elapsed > budgetSec) {
        record { qs.foreach(n => errors(n) = "skipped: bench budget exhausted") }
      } else {
        val w0 = System.nanoTime()
        val r = fork(qs)
        val dw = (System.nanoTime() - w0) / 1e9
        qs.foreach { n =>
          record {
            walls(n) = walls.getOrElse(n, 0.0) + dw / qs.size
            r(n) match {
              case Right(sec) => results(n) = sec
              case Left(err)  => errors(n) = err
            }
          }
          r(n) match {
            case Right(sec) =>
              System.err.println(f"[bench] $n group ${gi + 1}/${groups.size}: $sec%.3f s (wall $elapsed%.0f/$budgetSec%.0f)")
            case Left(err) =>
              System.err.println(s"[bench] $n group ${gi + 1}/${groups.size} FAILED: $err")
          }
        }
      }
    }
    // ── pass 2: isolated confirmation of suspicious observations ─────
    // A >3 s group observation may be group debris or a degradation
    // window; a group-failed query deserves one isolated retry. Spend
    // isolated forks while the budget holds, min over observations.
    val suspects = names.filter(n =>
      results.get(n).exists(_ > 3.0) ||
        errors.get(n).exists(!_.startsWith("skipped")))
    suspects.foreach { n =>
      val obs = scala.collection.mutable.ArrayBuffer[Double]()
      results.get(n).foreach(obs += _)
      var forks = 1 // the group pass counted as one observation
      def unstable: Boolean = obs.sorted.toList match {
        case best :: rest =>
          best > 3.0 && (rest.isEmpty || rest.head > 2.0 * best)
        case _ => true // still no observation: retry
      }
      while (forks < maxForks && unstable && elapsed < budgetSec) {
        val w0 = System.nanoTime()
        val r = fork(Seq(n))
        record { walls(n) = walls.getOrElse(n, 0.0) + (System.nanoTime() - w0) / 1e9 }
        forks += 1
        r(n) match {
          case Right(sec) =>
            obs += sec
            System.err.println(f"[bench] $n isolated $forks/$maxForks: $sec%.3f s (wall $elapsed%.0f/$budgetSec%.0f)")
          case Left(err) =>
            record { if (obs.isEmpty) errors(n) = err }
            System.err.println(s"[bench] $n isolated $forks/$maxForks FAILED: $err")
        }
      }
      record { if (obs.nonEmpty) { results(n) = obs.min; errors.remove(n) } }
    }
    val (fr, fe, fw) = snapshot()
    emitOnce(fr.sortBy(_._1), fe, fw)
    try Runtime.getRuntime.removeShutdownHook(hook) catch { case _: IllegalStateException => () }
  }

  /** Minimal parser for a child result line — the child emits
    * `{"query":"<name>","sec":<n>}` or `{"query":"<name>","err":"<msg>"}`
    * with no nesting, so a regex is sufficient (no JSON lib on the
    * classpath beyond Spark's shaded ones). */
  private def parseChildLine(line: String): Option[(String, Either[String, Double])] = {
    val name = """"query":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(line)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    val sec = """"sec":([0-9.eE+-]+)""".r.findFirstMatchIn(line).map(_.group(1).toDouble)
    val err = """"err":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(line)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    name.map(n => n -> sec.map(Right(_)).orElse(err.map(Left(_)))
      .getOrElse(Left(s"unparseable: $line")))
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

  /** Round to ≤1 decimal and strip trailing zeros — the compact-line
    * number format. Deciseconds is deliberate: the compact line must
    * FIT the driver's ~2 KB tail capture whole at 160+ queries (at
    * 2 dp the worst case already brushed the limit and each round adds
    * ~10 queries); the full-precision values are on the line above. */
  private def fmt1(v: Double): String =
    BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString

  /** Whole-second fallback format for the compact line (see [[emit]]). */
  private def fmt0(v: Double): String =
    BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString

  /** Emits the aggregate artifact as TWO JSON lines, engineered for the
    * driver's ~2 KB stdout TAIL capture (BENCH_r05 lost every timed
    * `sec` value to it — only the boot-inflated `wall` map survived):
    *
    *  1. the complete line — full-precision name→seconds `queries` map
    *     (the driver's parse contract) with the most diagnostic bytes
    *     LAST (`wall`/`errors` first, `queries` then `value` at the
    *     end), so even a mid-line cut preserves the timed numbers;
    *  2. a compact final line that FITS the tail whole: query names
    *     shortened to their unique id prefix (`d16_dup_stats` → `d16`;
    *     names whose prefix collides stay full), seconds at 1 dp,
    *     `sf` as a basename, and `"value"` (total timed sec) as the
    *     very last key.
    */
  private def emit(results: Seq[(String, Double)],
      errors: scala.collection.Map[String, String],
      walls: scala.collection.Map[String, Double] = Map.empty): Unit = {
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val wallJson = walls.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","unit":"sec","sf":"$sfDir","wall":$wallJson,"errors":$errJson,"queries":$qs,"value":$total}""")
    val prefixCount = results.map(_._1.split("_")(0))
      .groupBy(identity).map { case (p, v) => (p, v.size) }
    def sid(n: String): String = {
      val p = n.split("_")(0)
      if (prefixCount.getOrElse(p, 0) > 1) n else p
    }
    val sfBase = new java.io.File(sfDir).getName
    def compactLine(fmt: Double => String): String = {
      val cq = results.map { case (k, v) => s"${jstr(sid(k))}:${fmt(v)}" }
        .mkString("{", ",", "}")
      s"""{"metric":"total","unit":"sec","sf":"$sfBase","nq":${results.size},"nerr":${errors.size},"queries":$cq,"value":${fmt1(total)}}"""
    }
    // adaptive precision: 1 dp while the whole line fits the driver's
    // ~2 KB tail capture with slack, whole seconds past ~190 queries —
    // a cruder-but-complete map beats a truncated precise one (the
    // BENCH_r05 lesson); full-precision values are on the line above
    val l1 = compactLine(fmt1)
    println(if (l1.length <= 1900) l1 else compactLine(fmt0))
  }
}
