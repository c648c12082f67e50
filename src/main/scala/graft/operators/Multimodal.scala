package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** One extracted feature row: fixed-dim vector per media item. */
case class MediaFeature(media_id: Long, feat: Seq[Double])

/** One REAL-decoded image row: container metadata read from the actual
  * payload header, or all-NULL metadata for an undecodable payload. */
case class DecodedImage(media_id: Long, format: Option[String],
    width: Option[Int], height: Option[Int], channels: Option[Int],
    n_bytes: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * IMAGE decode is REAL: [[decodeImages]] reads PNG/JPEG/GIF/BMP headers
  * through `javax.imageio` (ships with the JDK — zero added
  * dependencies). The synthetic [[decodeImageMeta]] stays for payloads
  * that are deterministic fakes by design (the benchmark corpus), and
  * audio/video decode remains a clearly-marked STUB (no such codecs in
  * the JDK): those metadata are parsed from the first header bytes and
  * "frames"/"resize" are byte-range operations. Everything around the
  * stubs is the real production shape — binary columns flow through
  * parquet, metadata is a typed struct, frame sampling is an array of
  * binary slices, and feature extraction runs imperatively per partition
  * over a typed Dataset (the JVM analogue of batched Python UDFs: one
  * deserialization per partition, vectorizable inner loop, explicit
  * output encoder).
  */
object Multimodal {

  /** Deterministic fake media payload (32 bytes derived from a seed
    * column) — stands in for real image bytes in tests/benchmarks. */
  def fakeMediaBytes(seed: Column): Column =
    unhex(concat(md5(seed.cast("binary")), md5(concat(seed, lit("2")).cast("binary"))))

  private def byteAt(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 1)), 16, 10).cast("int")

  /** STUB decode: parses width/height/channels from the first three
    * header bytes. A real implementation would decode the container
    * format here; the output schema (typed struct) is the contract. */
  def decodeImageMeta(bin: Column): Column =
    struct(
      (byteAt(bin, 1) % 64 + 1).as("width"),
      (byteAt(bin, 2) % 64 + 1).as("height"),
      (byteAt(bin, 3) % 3 + 1).as("channels"),
      length(bin).as("n_bytes"))

  /** Frame sampling stub: fixed-stride byte slices (a video decoder would
    * emit one binary per sampled frame). Empty payloads yield zero frames
    * — without the guard, `sequence(0, floor((0-1)/stride))` would emit a
    * descending `[0, -1]` and fabricate two bogus frames. */
  def frameSample(bin: Column, stride: Int): Column =
    when(length(bin) === 0, expr("CAST(array() AS ARRAY<BINARY>)"))
      .otherwise(transform(
        sequence(lit(0), floor((length(bin) - 1) / stride).cast("int")),
        i => substring_index_bytes(bin, i * stride + 1, stride)))

  private def substring_index_bytes(bin: Column, start: Column, len: Int): Column =
    bin.substr(start, lit(len))

  /** Resize stub: byte-range downsample by `factor` (a real impl would
    * rescale pixels; the binary-in/binary-out shape is the contract). */
  def resize(bin: Column, factor: Int): Column =
    bin.substr(lit(1), (length(bin) / factor).cast("int"))

  /** Clip assembly — the video analogue of [[Chunk.chunkDocs]]: sampled
    * frames grouped into overlapping fixed-length clips (`clipFrames`
    * frames per clip, advancing `stepFrames` frames), each clip emitted
    * as its concatenated frame payload. Payloads with fewer than
    * `clipFrames` frames yield no clips. A real video pipeline swaps
    * the byte-slice frames for decoded ones; the array-of-binary-clips
    * shape and the window arithmetic are the contract. Pure projection
    * in the scan stage — no shuffle, like the text chunker. */
  def clipWindows(
      bin: Column, stride: Int, clipFrames: Int, stepFrames: Int): Column = {
    val frames = frameSample(bin, stride)
    when(size(frames) < clipFrames, expr("CAST(array() AS ARRAY<BINARY>)"))
      .otherwise(transform(
        sequence(lit(0), ((size(frames) - clipFrames) / stepFrames).cast("int")),
        w => aggregate(slice(frames, w * stepFrames + 1, lit(clipFrames)),
          lit(Array.emptyByteArray),
          (acc, f) => concat(acc, f))))
  }

  /** Media QA-gate report — the multimodal twin of the q34 relational
    * expectations audit: each ingest gate (payload present, container
    * length matches metadata, RGB, orientation, minimum resolution)
    * evaluated over the DECODED metadata, reported as per-check pass
    * rates in integer ppm. In a real pipeline failing rows are
    * quarantined; the report is what pages you when a scraper starts
    * shipping truncated or grayscale payloads.
    *
    * Scale shape: decode is a scan-stage projection; the checks melt
    * through `stack` (a Generate, no Expand/shuffle duplication —
    * [[Profile.numericProfile]]'s rule) and aggregate on a
    * checks-count-sized key space. One shuffle of (check, partial
    * counts).
    *
    * Output: one row per check, `(check_name, n, n_pass, pass_ppm)`.
    */
  def qaReport(media: DataFrame, binCol: String = "bytes"): DataFrame = {
    val m = media.withColumn("_meta", decodeImageMeta(col(binCol)))
    val melted = m.select(expr(
      """stack(5,
        |  'payload_nonempty', _meta.n_bytes > 0,
        |  'bytes_match_meta', _meta.n_bytes = 32,
        |  'rgb_channels', _meta.channels = 3,
        |  'landscape', _meta.width >= _meta.height,
        |  'min_resolution', _meta.width * _meta.height >= 256
        |) AS (check_name, passed)""".stripMargin))
    melted.groupBy(col("check_name"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("passed"), 1L)), lit(0L)).as("n_pass"))
      .select(col("check_name"), col("n"), col("n_pass"),
        expr("CAST(CAST(n_pass AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)")
          .as("pass_ppm"))
  }

  /** REAL image decode — `javax.imageio`, which ships with the JDK, so
    * PNG / JPEG / GIF / BMP metadata is decodable with zero added
    * dependencies (this is the non-stub sibling of [[decodeImageMeta]];
    * the synthetic path stays for payloads that are fakes by design).
    *
    * Header-only: `reader.getWidth/getHeight/getImageTypes` parse the
    * container header and never materialize the raster, so the cost per
    * item is O(header bytes), not O(pixels) — the property that makes a
    * metadata sweep over billions of scraped images tractable.
    * `channels` is the sample model's band count (3 for RGB, 1 for
    * grayscale or palette GIF, 4 for RGBA), the raster-layout notion a
    * training pipeline filters on. Undecodable payloads (no registered
    * reader, or a reader that throws on a truncated header) yield NULL
    * metadata — quarantine rows for the caller's QA gate — never a
    * failed job: one corrupt scrape must not kill a 100 TB sweep.
    *
    * Scale shape: per-partition imperative loop over the binary column
    * (the [[extractFeatures]] pattern) — a scan-stage projection, no
    * shuffle; parallelism is the input's partitioning.
    *
    * Output: `(media_id, format, width, height, channels, n_bytes)`;
    * format is the reader's name lowercased ("png", "jpeg", "bmp",
    * "gif"). */
  def decodeImages(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes"): DataFrame = {
    // null-id rows are dropped up front (an id-less media row is
    // unaddressable downstream either way) — Encoders.scalaLong would
    // otherwise NPE the task on an ordinary nullable parquet cell. A
    // NULL *payload* is the quarantine case, handled per row below.
    val in = media.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.map { case (id, rawBytes) =>
        // a NULL binary cell is ordinary in scraped media: quarantine
        // (n_bytes 0), never an NPE — one corrupt row must not kill a
        // 100 TB sweep
        val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
        val decoded =
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) None
              else {
                val r = readers.next()
                try {
                  r.setInput(iis)
                  val bands =
                    r.getImageTypes(0).next().getSampleModel.getNumBands
                  Some((r.getFormatName.toLowerCase, r.getWidth(0),
                    r.getHeight(0), bands))
                } finally r.dispose()
              }
            } finally if (iis != null) iis.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some((f, w, h, c)) =>
            DecodedImage(id, Some(f), Some(w), Some(h), Some(c), bytes.length.toLong)
          case None =>
            DecodedImage(id, None, None, None, None, bytes.length.toLong)
        }
      }
    }(Encoders.product[DecodedImage]).toDF()
  }

  /** Per-partition imperative feature extraction over the binary payload
    * (first `dim` bytes scaled to [0,1)). Runs as one JVM loop per
    * partition — the pattern a real decoder/featurizer plugs into. */
  def extractFeatures(
      media: DataFrame, idCol: String = "media_id", binCol: String = "bytes",
      dim: Int = 8): DataFrame = {
    // same null discipline as [[decodeImages]]: null ids dropped, a
    // NULL payload treated as empty (zero-padded features)
    val in = media.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.map { case (id, rawBytes) =>
        val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
        // payloads shorter than `dim` are zero-padded
        MediaFeature(id, (0 until dim).map(i =>
          (if (i < bytes.length) bytes(i) & 0xff else 0) / 256.0))
      }
    }(Encoders.product[MediaFeature]).toDF()
  }
}
