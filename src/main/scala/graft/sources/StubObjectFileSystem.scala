package graft.sources

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.SparkSession

/** A local-disk-backed Hadoop FileSystem mounted on its own
  * `stubs3://` scheme — the zero-egress stand-in for an S3-compatible
  * object store (reference: tests/test_with_minio.rs:55-110, which runs a
  * `COUNT(1)` through a real MinIO endpoint).
  *
  * Reading `stubs3:///path/table.parquet` exercises every layer a real
  * object-store read uses EXCEPT the wire protocol: scheme resolution via
  * `fs.<scheme>.impl`, `FileSystem.get` instantiation, directory listing,
  * the output-committer rename protocol on write, and Spark's split
  * planning over the returned file statuses. The wire protocol itself
  * (s3a + AWS SDK) is not bundled with this build; on a cluster, swap the
  * conf for [[graft.Graft.s3aConf]] and the URLs for `s3a://bucket/...` —
  * no query code changes.
  */
class StubObjectFileSystem extends RawLocalFileSystem {
  override def getScheme: String = StubObjectFileSystem.Scheme
  override def getUri: URI = URI.create(StubObjectFileSystem.Scheme + ":///")
}

object StubObjectFileSystem {
  val Scheme = "stubs3"

  /** Mounts the stub scheme on the session's Hadoop conf, the same wiring
    * point [[graft.Graft.s3aConf]] uses for real s3a settings. */
  def register(spark: SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.$Scheme.impl", classOf[StubObjectFileSystem].getName)

  /** `stubs3://` URL for a local directory. */
  def url(localDir: String): String = s"$Scheme://$localDir"
}
