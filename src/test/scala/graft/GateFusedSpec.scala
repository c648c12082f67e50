package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{QualityRules, Text}

/** The fused-gate parity contract: every column
  * [[Text.withGateProfile]] emits must be BIT-IDENTICAL to the
  * composable forms it replaces — on the corpus AND on the adversarial
  * inputs where a single-pass scanner is easiest to get wrong
  * (case-mapping that merges/splits token runs, astral code points,
  * dot runs, space-only trim semantics, trailing newlines). */
class GateFusedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("gate-fused-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.registerAll(s)
    s
  }

  /** The composable path, emitting the same column names at the same
    * thresholds as withGateProfile's defaults. */
  private def composedProfile(df: DataFrame): DataFrame = {
    val c = col("text")
    val flagged = df.select(
      (Seq(col("id"), col("text"),
        Text.tokenCount(c).cast("long").as("n_tokens"),
        Text.qualityScore(c).as("quality"),
        Text.langId(c).as("lang_pred")) ++
        QualityRules.flags(c)): _*)
    val sp = Text.withScriptProfile(flagged, col("text")).drop("text")
    sp.select(col("*"),
      Text.scriptMixed(Text.scriptCountCols,
        Text.scriptCountCols.reduce(_ + _)).as("script_mixed"))
  }

  private def fusedProfile(df: DataFrame): DataFrame =
    Text.withGateProfile(df.select(col("id"), col("text")), col("text"))
      .drop("text")

  private def assertIdentical(df: DataFrame): Unit = {
    val comp = composedProfile(df)
    val fus = fusedProfile(df)
    assert(comp.columns.toSet === fus.columns.toSet,
      s"column sets differ: ${comp.columns.toSet} vs ${fus.columns.toSet}")
    val cols = comp.columns.sorted
    val a = comp.select(cols.map(col): _*).collect()
      .map(r => r.getAs[Long]("id") -> r.toSeq).toMap
    val b = fus.select(cols.map(col): _*).collect()
      .map(r => r.getAs[Long]("id") -> r.toSeq).toMap
    assert(a.keySet === b.keySet)
    a.keySet.toSeq.sorted.foreach { id =>
      assert(a(id) === b(id),
        s"id $id differs:\n composed=${cols.zip(a(id))}\n fused   =${cols.zip(b(id))}")
    }
  }

  test("fused gate == composable gate on the documents corpus") {
    val docs = SparkEntry.tbl(spark, TestData.dir("0.01"), "documents")
      .select(col("doc_id").cast("long").as("id"), col("text"))
    assertIdentical(docs)
  }

  test("fused gate == composable gate on adversarial strings") {
    import spark.implicits._
    val rows: Seq[(Long, String)] = Seq(
      1L -> "",                                   // empty: every denominator 0
      2L -> "the quick brown fox and that dog have fun with it",
      3L -> "KKelvin and İstanbul are here", // case-map merges/splits runs
      4L -> "dots..... and .... and ... and .. and .",      // non-overlapping ... runs
      5L -> "# ## #tag ...... x",
      6L -> "- bullet one\n * starred\n\t- tab survives ltrim\n-no space",
      7L -> "ends in dots ...\nends in dots ... \nends in dots ...\t\nplain",
      8L -> "\n\n\n",                              // empty lines + trailing empty
      9L -> "trailing newline\n",
      10L -> "emoji 😀😀 counts once each",
      11L -> "mixed текст αβγ 中文 مرحبا latin",
      12L -> "don't can't won't o'clock '''",
      13L -> "der die das und ist nicht ein zu mit auf le la les et est",
      14L -> "   leading spaces then - not a bullet",
      15L -> "of of of the the be to with have that",
      16L -> "a.b...c....d.....e......f",
      17L -> " \n - x\n-  y\n* z\n*w",
      18L -> "élève naïve façade",   // accents: non-token, non-alpha
      19L -> (("x" * 300) + " " + ("word " * 60)), // volume saturation
      20L -> "THE A OF TO AND IN IS THAT IT FOR")  // uppercase stopwords
    assertIdentical(rows.toDF("id", "text"))
  }

  test("fused gate == composable gate on 300 seeded random hostile strings") {
    import spark.implicits._
    // every atom chosen to stress a scanner state machine: token-class
    // chars, dots in runs, bullet markers, space-vs-tab trim edges,
    // newlines, case-mapping traps (Kelvin sign, dotted capital I),
    // all five script ranges, an astral surrogate pair, stopwords of
    // all four languages, required words
    val atoms: Array[String] = Array(
      "a", "b", "Z", "q", "0", "9", "'", "#", ".", "-", "*", " ", "  ",
      "\n", "\t", "K", "İ", "é", "б", "α",
      "世", "م", "😀", "the", "of", "und", "les",
      "der", "que", "...", "....", "- ", "* ", ". ")
    val rnd = new scala.util.Random(4713)
    val rows: Seq[(Long, String)] = (1L to 300L).map { i =>
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb.append(atoms(rnd.nextInt(atoms.length))))
      (i, sb.toString)
    }
    assertIdentical(rows.toDF("id", "text"))
  }

  test("fused gate profile survives a downstream filter without re-inlining") {
    // the withScriptProfile lesson: the generator barrier means a
    // WHERE over emitted columns must not push into the scan — assert
    // exactly one gate_metrics evaluation in the optimized plan
    val docs = SparkEntry.tbl(spark, TestData.dir("0.001"), "documents")
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val gated = fusedProfile(docs)
      .where(col("quality") >= 0.3 && col("passes_quality") === false)
    val plan = gated.queryExecution.optimizedPlan.toString
    val occurrences = "(?i)gatemetrics".r.findAllIn(plan).length
    assert(occurrences == 1,
      s"expected exactly one GateMetrics in the optimized plan, got $occurrences:\n$plan")
    gated.collect() // and it must execute
  }
}
