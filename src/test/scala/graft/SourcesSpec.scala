package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink surface from SURVEY §2.2: parquet scan, partitioned CSV
  * directory with explicit schema, in-memory tables with explicit
  * partitioning, VALUES relations, limit/show/collect sinks, the
  * S3A object-store conf wiring ([[Graft.s3aConf]] — the store itself is
  * unreachable zero-egress, so the test asserts the Hadoop conf
  * contract), and the multi-file Avro directory read through the
  * bundled [[graft.sources.avro.AvroDataSource]].
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("sources")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val sf = TestData.dir("0.001")

  test("parquet scan with pushed filter and pruned columns") {
    val df = SparkEntry.tbl(spark, sf, "lineitem")
      .where(col("l_quantity") > 25)
      .select(col("l_orderkey"), col("l_quantity"))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]"),
      s"filter not pushed to parquet scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned at scan:\n$plan")
  }

  test("hive-partitioned parquet: partition filter prunes directories at plan time") {
    // the 100 TB layout for event logs is date-partitioned parquet; a
    // day filter must prune partition DIRECTORIES (never listed, never
    // read), not just push a data filter into surviving files
    val dir = Files.createTempDirectory("graft_hivepart").toString
    SparkEntry.tbl(spark, sf, "events")
      .withColumn("day", date_format(to_date(col("ts")), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val all = spark.read.parquet(dir)
    val oneDay = all.where(col("day") === "2024-01-02")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter not applied as a partition filter:\n$plan")
    val scannedParts = oneDay.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }.sum
    assert(scannedParts === 1, s"expected exactly 1 surviving partition, got $scannedParts")
    val expected = SparkEntry.tbl(spark, sf, "events")
      .where(to_date(col("ts")) === "2024-01-02").count()
    assert(oneDay.count() === expected)
  }

  test("partitioned CSV directory with explicit schema round-trips") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val src = SparkEntry.tbl(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    src.repartition(3).write.mode("overwrite").csv(dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType)))
    val back = spark.read.schema(schema).csv(dir)
    assert(back.count() === src.count())
    assert(back.agg(sum("l_quantity")).head.getDouble(0) ===
      src.agg(sum("l_quantity")).head.getDouble(0))
  }

  test("in-memory table with explicit partitions feeds two-phase aggregation") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 10, i.toLong)).toDF("k", "v").repartition(2)
    assert(df.rdd.getNumPartitions === 2)
    val agg = df.groupBy("k").agg(sum("v").as("s")).orderBy("k")
    assert(agg.count() === 10)
  }

  test("VALUES relation + re-registered materialized result") {
    spark.sql("CREATE OR REPLACE TEMP VIEW vals AS SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(id, s)")
    val r = spark.sql("SELECT count(*) FROM vals").head.getLong(0)
    assert(r === 2)
    val materialized = spark.sql("SELECT id * 10 AS id10 FROM vals")
    materialized.cache().createOrReplaceTempView("vals2")
    assert(spark.sql("SELECT sum(id10) FROM vals2").head.getLong(0) === 30)
  }

  test("limit sink (TakeOrderedAndProject under sort)") {
    val df = SparkEntry.tbl(spark, sf, "orders")
      .orderBy(col("o_totalprice").desc).limit(10)
    assert(df.collect().length === 10)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("JSON and ORC sources round-trip with explicit schemas") {
    val src = SparkEntry.tbl(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val jsonDir = Files.createTempDirectory("graft_json").toString
    src.repartition(2).write.mode("overwrite").json(jsonDir)
    val jsonBack = spark.read.schema(src.schema).json(jsonDir)
    assert(jsonBack.count() === src.count())
    // exact decimal sum: a double sum is partition-order-dependent and
    // the round-trip changes the partitioning
    def total(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head.getDecimal(0)
    assert(total(jsonBack) === total(src))
    val orcDir = Files.createTempDirectory("graft_orc").toString
    src.repartition(2).write.mode("overwrite").orc(orcDir)
    val orcBack = spark.read.orc(orcDir)
    assert(orcBack.count() === src.count())
    assert(orcBack.schema === src.schema)
  }

  test("gzipped JSONL round-trips escape-heavy text exactly; parallelism = shard count") {
    import spark.implicits._
    // the characters JSONL must escape: raw newlines (forbidden in the
    // line format), quotes, backslashes, tabs, control chars, non-ASCII
    val docs = Seq(
      (1L, "line1\nline2\twith \"quotes\" and \\backslash\\"),
      (2L, "unicode: café ✓ ß 日本語"),
      (3L, "ctl: end"),
      (4L, "")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_jsonl_gz").toString
    docs.repartition(2).write.mode("overwrite")
      .option("compression", "gzip").json(dir)
    val back = spark.read.schema("doc_id BIGINT, text STRING").json(dir)
    assert(back.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    // gzip is non-splittable: one task per shard file — the scan's
    // partition count equals the shard count, which is why production
    // jsonl.gz corpora ship as many moderate shards
    assert(back.select(input_file_name()).distinct().count() === 2)
    assert(back.rdd.getNumPartitions === 2)
  }

  test("bzip2 JSONL: ONE shard splits into many scan tasks (layout-independent parallelism)") {
    import spark.implicits._
    // the production complement of the gzip test above: gzip parallelism
    // is capped at the shard count, a SPLITTABLE codec (bzip2 — the one
    // splittable compressor in stock Hadoop; zstd/gzip are not) lets the
    // reader split a single large shard by byte ranges, so scan
    // parallelism is layout-independent. Same reader path, only the
    // codec changes — proving j1's schema-explicit read is not secretly
    // relying on the shard layout for parallelism.
    val docs = SparkEntry.tbl(spark, TestData.dir("0.01"), "documents")
      .select(col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("graft_jsonl_bz2").toString
    docs.coalesce(1).write.mode("overwrite")
      .option("compression", "bzip2").json(dir)
    val shards = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".json.bz2"))
    assert(shards === 1, s"fixture must be a single shard, got $shards")
    // force small splits so the single ~20 KB compressed shard fans out
    val back = spark.read
      .schema("doc_id BIGINT, source STRING, lang STRING, text STRING")
      .option("multiLine", "false")
      .json(dir)
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val split = spark.read
        .schema("doc_id BIGINT, source STRING, lang STRING, text STRING")
        .json(dir)
      assert(split.rdd.getNumPartitions > shards,
        s"splittable codec must out-parallelize the shard count, got ${split.rdd.getNumPartitions}")
      // content survives the split boundaries exactly
      val want = docs.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val got = split.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(3))).toSeq
      assert(got === want)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
    assert(back.count() === docs.count())
  }

  test("bucketed tables: co-located join with no exchange, bucket pruning on point lookups") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bucketed").toFile.getAbsolutePath
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "l")
    val right = (1 to 1000).map(i => (i.toLong, i * 2L)).toDF("id", "r")
    left.write.mode("overwrite").option("path", s"$dir/left")
      .bucketBy(8, "id").sortBy("id").saveAsTable("bkt_left")
    right.write.mode("overwrite").option("path", s"$dir/right")
      .bucketBy(8, "id").sortBy("id").saveAsTable("bkt_right")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // co-located join: both sides pre-bucketed on the key → the join
      // runs on the bucket layout, no Exchange anywhere in the plan
      val j = spark.table("bkt_left").join(spark.table("bkt_right"), "id")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed-by-key join must not re-shuffle either side:\n$p")
      assert(j.count() === 1000)
      // bucket pruning: an equality filter touches 1 of 8 buckets.
      // (The planner turns bucketed scans OFF for join-free queries by
      // default — pruning needs the bucketed layout kept on.)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val one = spark.table("bkt_left").where(col("id") === 5L)
      val pp = one.queryExecution.executedPlan.toString
      assert(pp.contains("SelectedBucketsCount: 1 out of 8"),
        s"point lookup should prune to one bucket:\n$pp")
      assert(one.count() === 1)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("avro multi-file directory reads through the bundled graft-avro source") {
    // The reference's avro support registers a DIRECTORY of container
    // files as one table behind a feature gate
    // (/root/reference/tests/sqllogictests/src/setup.rs:32-62, gate
    // main.rs:258-270). The spark-avro connector module is absent in
    // this zero-egress build, so graft ships its own minimal DSv2
    // reader over the BUNDLED avro jars (graft.sources.avro) — this
    // test writes two container files with the plain avro-java API
    // (driver-side, dimension-sized fixture) and reads them back as
    // one multi-file table, the reference's exact registration shape.
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.LogicalTypes
    val tsMicros = LogicalTypes.timestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    val avroSchema: Schema = SchemaBuilder.record("nation").fields()
      .requiredLong("n_nationkey")
      .name("n_name").`type`().unionOf().nullType().and().stringType().endUnion().nullDefault()
      .requiredLong("n_regionkey")
      .name("loaded_at").`type`(tsMicros).noDefault()
      .endRecord()
    val src = SparkEntry.tbl(spark, sf, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val dir = Files.createTempDirectory("graft_avro")
    src.grouped((src.length + 1) / 2).zipWithIndex.foreach { case (rows, i) =>
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      w.create(avroSchema, dir.resolve(s"part$i.avro").toFile)
      rows.foreach { case (k, n, r) =>
        val rec = new GenericData.Record(avroSchema)
        rec.put("n_nationkey", k)
        rec.put("n_name", if (k == 0) null else n) // exercise the null union
        rec.put("n_regionkey", r)
        rec.put("loaded_at", 1704067200000000L + k) // 2024-01-01 + k µs
        w.append(rec)
      }
      w.close()
    }
    val back = spark.read.format("graft-avro").load(dir.toString)
    assert(back.schema.map(f => (f.name, f.dataType.typeName, f.nullable)) ===
      Seq(("n_nationkey", "long", false), ("n_name", "string", true),
        ("n_regionkey", "long", false), ("loaded_at", "timestamp", false)))
    // timestamp-micros logical type relabels to a real Catalyst timestamp
    assert(back.where(col("n_nationkey") === 0)
      .select(date_format(col("loaded_at"), "yyyy-MM-dd HH:mm:ss"))
      .head.getString(0) === "2024-01-01 00:00:00")
    assert(back.count() === src.length)
    assert(back.where(col("n_name").isNull).count() === 1)
    assert(back.agg(sum("n_nationkey")).head.getLong(0) === src.map(_._1).sum)
    // re-register as a table and query through SQL, like the slt gate
    back.createOrReplaceTempView("alltypes_plain_multi_files")
    assert(spark.sql(
      "SELECT count(*) FROM alltypes_plain_multi_files WHERE n_regionkey = 0")
      .head.getLong(0) === src.count(_._3 == 0L))
  }

  test("avro: multi-path load, mixed-schema rejection, and a missing-field fail-fast") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    def write(file: java.io.File, schema: Schema, rows: Seq[Map[String, Any]]): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, file)
      rows.foreach { m =>
        val rec = new GenericData.Record(schema)
        m.foreach { case (k, v) => rec.put(k, v) }
        w.append(rec)
      }
      w.close()
    }
    val sA: Schema = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("name").endRecord()
    // same field NAME, different type — the silent-null hazard shape
    val sB: Schema = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredDouble("name").endRecord()
    // field simply absent
    val sC: Schema = SchemaBuilder.record("r").fields()
      .requiredLong("id").endRecord()
    val d1 = Files.createTempDirectory("graft_avro_mp1")
    val d2 = Files.createTempDirectory("graft_avro_mp2")
    write(d1.resolve("a.avro").toFile, sA,
      Seq(Map("id" -> 1L, "name" -> "x"), Map("id" -> 2L, "name" -> "y")))
    write(d2.resolve("b.avro").toFile, sA, Seq(Map("id" -> 3L, "name" -> "z")))
    // multiple .load(p1, p2) paths arrive as a JSON "paths" option — the
    // source must read the union, not fail with "requires a path"
    val multi = spark.read.format("graft-avro").load(d1.toString, d2.toString)
    assert(multi.count() === 3)
    assert(multi.agg(sum("id")).head.getLong(0) === 6L)
    // mixed-schema directory: schema is inferred from the FIRST file;
    // a later file with the same field at a different type (or missing
    // the field) must fail loudly at read, never yield silent nulls
    val mixed = Files.createTempDirectory("graft_avro_mixed")
    write(mixed.resolve("0first.avro").toFile, sA, Seq(Map("id" -> 1L, "name" -> "x")))
    write(mixed.resolve("1badtype.avro").toFile, sB, Seq(Map("id" -> 2L, "name" -> 9.9)))
    def chainMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => String.valueOf(x.getMessage)).mkString(" | ")
    val e1 = intercept[Exception] {
      spark.read.format("graft-avro").load(mixed.toString).count()
    }
    assert(chainMsg(e1).contains("field 'name'"),
      s"mixed-type read must name the offending field: ${chainMsg(e1)}")
    val missing = Files.createTempDirectory("graft_avro_missing")
    write(missing.resolve("0first.avro").toFile, sA, Seq(Map("id" -> 1L, "name" -> "x")))
    write(missing.resolve("1nofield.avro").toFile, sC, Seq(Map("id" -> 2L)))
    val e2 = intercept[Exception] {
      spark.read.format("graft-avro").load(missing.toString).count()
    }
    assert(chainMsg(e2).contains("no field 'name'"),
      s"missing-field read must fail fast, not null-fill: ${chainMsg(e2)}")
  }

  test("csv source: PERMISSIVE captures malformed rows, DROPMALFORMED removes them") {
    val dir = Files.createTempDirectory("graft_badcsv").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part.csv"),
      "1,alpha\n2,beta\nnot_a_number,gamma\n3,delta\n")
    val dataSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val permSchema = dataSchema.add(StructField("_corrupt_record", StringType))
    val perm = spark.read.schema(permSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
    // Spark forbids filtering on only the corrupt column of a lazy scan —
    // materialize first (the documented contract for corrupt-record audits)
    perm.cache()
    try {
      assert(perm.count() === 4)
      val bad = perm.where(col("_corrupt_record").isNotNull).collect()
      assert(bad.length === 1 && bad.head.getAs[String]("_corrupt_record")
        .startsWith("not_a_number"))
      assert(perm.where(col("_corrupt_record").isNull)
        .agg(sum(col("id"))).head.getLong(0) === 6L)
    } finally perm.unpersist()
    val dropped = spark.read.schema(dataSchema)
      .option("mode", "DROPMALFORMED").csv(dir)
    // count() alone prunes ALL columns from the scan, so nothing is parsed
    // and DROPMALFORMED has no malformed rows to drop — materialize the
    // columns to exercise the mode
    assert(dropped.collect().length === 3)
  }

  test("s3a conf helper wires the object-store settings onto the session") {
    // the Spark analogue of the reference's register_object_store over a
    // MinIO endpoint (tests/test_with_minio.rs:84-92); zero-egress, so we
    // assert the Hadoop conf contract that s3a:// reads consume
    Graft.s3aConf(spark, endpoint = "http://localhost:9000",
      accessKey = "minio", secretKey = "minio123")
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") === "http://localhost:9000")
    assert(hc.get("fs.s3a.access.key") === "minio")
    assert(hc.get("fs.s3a.secret.key") === "minio123")
    assert(hc.get("fs.s3a.path.style.access") === "true")
    assert(hc.get("fs.s3a.connection.ssl.enabled") === "false")
    assert(hc.get("fs.s3a.aws.credentials.provider")
      === "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
  }

  test("object-store read-through: write, list and count over a non-default scheme") {
    // the zero-egress analogue of the reference's MinIO round-trip
    // (tests/test_with_minio.rs:55-110): a full write → commit-rename →
    // list → filtered read through FileSystem machinery resolved from the
    // fs.<scheme>.impl conf, not the default local scheme
    import graft.sources.StubObjectFileSystem
    StubObjectFileSystem.register(spark)
    val dir = Files.createTempDirectory("graft_stub_store").toString
    val url = StubObjectFileSystem.url(s"$dir/orders")
    val src = SparkEntry.tbl(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    src.repartition(2).write.mode("overwrite").parquet(url)
    val back = spark.read.parquet(url)
    assert(back.count() === src.count())
    // the scan's splits must really come from the stub scheme's listing
    assert(back.inputFiles.nonEmpty &&
      back.inputFiles.forall(_.startsWith(s"${StubObjectFileSystem.Scheme}://")))
    // the minio test's shape: an aggregate driven through SQL on the store
    back.createOrReplaceTempView("stub_orders")
    val n = spark.sql("SELECT count(1) FROM stub_orders WHERE o_totalprice > 100")
      .head.getLong(0)
    assert(n === src.where(col("o_totalprice") > 100).count())
  }

  test("schema evolution: mergeSchema unions parquet generations, old rows null-fill") {
    import spark.implicits._
    // generation v1 writes (id, a); v2 adds a column (id, a, b) — the
    // additive-column evolution every long-lived dataset goes through
    val dir = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "z", 30L)).toDF("id", "a", "b")
      .write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "a", "b", "gen"))
    val rows = merged.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(30L)),
      "v1 rows null-fill the new column; v2 rows carry it")
    // without the option the footer-sampled schema may miss 'b' — assert
    // the merged read is the contract, not the default
    assert(merged.where(col("b").isNotNull).count() === 1)
  }

  test("test-data locator honors the system-property override") {
    assert(TestData.root === "/root/testdata") // default in this env
    try {
      sys.props("graft.testdata") = "/tmp/alt_testdata"
      assert(TestData.dir("0.01") === "/tmp/alt_testdata/sf0.01")
    } finally sys.props.remove("graft.testdata")
  }
}
