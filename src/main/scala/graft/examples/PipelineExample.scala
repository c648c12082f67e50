package graft.examples

import org.apache.spark.sql.functions._

import graft.{Graft, TestData}
import graft.SparkEntry.tbl
import graft.functions.Text
import graft.operators.{Dedup, Split}

/** End-to-end training-data curation pipeline over the documents table —
  * the integration story for the LLM-pipeline operators: exact dedup →
  * quality/language filtering → near-dup group clustering (one keeper
  * per component) → deterministic train/val/test split → corpus stats.
  *
  * Every stage is a DataFrame transform (scales with partitioning); the
  * near-dup stage is the banded-LSH candidate join, never all-pairs, and
  * running exact dedup FIRST is what keeps the LSH band buckets small
  * (identical documents would otherwise share every band key — see
  * `Dedup.capBuckets`).
  *
  * Run: `sbt "runMain graft.examples.PipelineExample [sfDir]"`.
  */
object PipelineExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(TestData.dir("0.001"))
    val spark = Graft.localSession("pipeline-example")

    val docs = tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val total = docs.count()

    // 1. exact dedup: keep each content hash's min doc_id
    val exact = Dedup.exact(docs)
    val uniq = docs.join(
      exact.where(!col("is_dup")).select(col("doc_id")), "doc_id")

    // 2. quality + language gate (native codegen'd text functions)
    val scored = uniq.select(col("doc_id"), col("text"),
      Text.qualityScore(col("text")).as("quality"),
      Text.langId(col("text")).as("lang_pred"),
      Text.tokenCount(col("text")).as("n_tokens"))
    val kept = scored.where(col("quality") >= 0.5 && col("n_tokens") >= 10)

    // 3. near-dup removal via GROUP clustering: transitive near-dups
    //    collapse to one keeper per connected component (pairwise
    //    drop-the-higher-id under-removes chains: a~b, b~c keeps a and c)
    val pairs = Dedup.minhashLshPairs(kept, threshold = 0.6)
    val groups = Dedup.connectedComponents(pairs)
    val losers = groups.where(col("doc_id") =!= col("group_id"))
      .select(col("doc_id"))
    val clean = kept.join(losers, Seq("doc_id"), "left_anti")

    // 4. deterministic split: pure hash of doc_id, stable across reruns
    val split = Split.assignSplit(clean, "doc_id")

    // 5. corpus report per split
    val report = split.groupBy(col("split")).agg(
      count(lit(1)).as("docs"),
      sum(col("n_tokens")).as("tokens"),
      round(avg(col("quality")), 4).as("avg_quality"))
    println(s"input=$total unique=${uniq.count()} kept=${kept.count()} clean=${clean.count()}")
    report.orderBy(col("split")).show(false)
    spark.stop()
  }
}
