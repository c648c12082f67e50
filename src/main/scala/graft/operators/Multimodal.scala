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

/** One REAL-decoded audio row: WAV/RIFF container metadata read from
  * the actual payload header, or all-NULL metadata for an undecodable /
  * truncated payload. `n_frames` and `duration_ms` are exact integers
  * (sample frames; floor milliseconds) so the row is replayable by any
  * SQL engine. */
case class DecodedAudio(media_id: Long, codec: Option[String],
    sample_rate: Option[Int], channels: Option[Int],
    bits_per_sample: Option[Int], n_frames: Option[Long],
    duration_ms: Option[Long], n_bytes: Long)

/** One REAL-decoded video row: MP4/ISO-BMFF container metadata read
  * from the actual payload's box structure, or all-NULL metadata for
  * an undecodable / truncated payload. `duration_ms` is an exact floor
  * division of mvhd duration units by the movie timescale. */
case class DecodedVideo(media_id: Long, brand: Option[String],
    timescale: Option[Long], duration_ms: Option[Long],
    n_tracks: Option[Int], n_bytes: Long)

/** One perceptual-hash row: the 64-bit dHash of a decoded raster as
  * FOUR 16-bit band keys (rows 0-1 → b0, … rows 6-7 → b3) — the
  * representation the Hamming-banded pair join consumes directly, and
  * one that never touches BIGINT bit 63 (DuckDB raises on `1 << 63`,
  * so a single signed-64 hash column could not be oracle-replayed).
  * All-NULL bands = quarantine (undecodable / sub-9×8 payload). */
case class PerceptualHash(media_id: Long, b0: Option[Int], b1: Option[Int],
    b2: Option[Int], b3: Option[Int])

/** One 256-bit perceptual-hash row: the 16×17-grid dHash as EIGHT
  * 32-bit band keys — the web-scale band representation (2³² key
  * space per band → flat occupancy at any corpus size; 32-bit values
  * in longs, so no signed-bit hazard on either engine). All-NULL =
  * quarantine (undecodable / sub-17×16 payload). */
case class PerceptualHashDeep(media_id: Long,
    b0: Option[Long], b1: Option[Long], b2: Option[Long], b3: Option[Long],
    b4: Option[Long], b5: Option[Long], b6: Option[Long], b7: Option[Long])

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * CONTAINER decode is REAL for all three modalities, zero added
  * dependencies: [[decodeImages]] reads PNG/JPEG/GIF/BMP headers
  * through `javax.imageio`; [[decodeAudio]] walks WAV/RIFF chunks and
  * [[decodeVideo]] walks MP4/ISO-BMFF boxes in pure JDK byte
  * arithmetic — all header-only, all quarantining corrupt scrapes as
  * NULL metadata. SAMPLE access is real where the JDK can decode it
  * (full rasters for the perceptual image hashes; PCM16 samples for
  * the audio energy hashes); compressed A/V codec decode (H.264, AAC,
  * MP3, …) needs external libraries absent here — those payloads keep
  * their container metadata and are bucketed for a second-pass
  * decoder, exactly the production posture. The synthetic
  * [[decodeImageMeta]] stays for payloads that are deterministic fakes
  * by design (the benchmark corpus), and "frames"/"resize" over opaque
  * payloads are byte-range operations. Everything around the decoders
  * is the real production shape — binary columns flow through parquet,
  * metadata is a typed struct, frame sampling is an array of binary
  * slices, and feature extraction runs imperatively per partition over
  * a typed Dataset (the JVM analogue of batched Python UDFs: one
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

  /** REAL audio decode — WAV/RIFF header parsing in pure JDK byte
    * arithmetic (the audio container a speech-data pipeline meets
    * first; compressed codecs need external libs, absent here — their
    * payloads quarantine, exactly the contract). The sibling of
    * [[decodeImages]] with the same three disciplines:
    *
    *  - HEADER-ONLY: the RIFF chunk walk reads the `fmt ` fields and
    *    the `data` chunk's declared length and never materializes a
    *    sample — O(header bytes) per item, the property that makes a
    *    metadata sweep over billions of scraped clips tractable;
    *  - QUARANTINE, never a failed job: non-RIFF payloads, truncated
    *    headers, declared data that exceeds the payload, and
    *    nonsensical `fmt ` fields (zero rate/channels, blockAlign ≠
    *    channels·bits/8) all yield all-NULL metadata rows;
    *  - EXACT integers: `n_frames` = data bytes / blockAlign,
    *    `duration_ms` = n_frames·1000 / rate (floor) — replayable by
    *    any SQL engine, no float drift.
    *
    * `codec` names the `fmt ` audio-format tag: "pcm" (1),
    * "ieee_float" (3), "alaw" (6), "mulaw" (7), else "fmt_<tag>"
    * (including the WAVE_FORMAT_EXTENSIBLE 65534 — a pipeline buckets
    * those for a second-pass decoder).
    *
    * Scale shape: scan-stage `mapPartitions` projection, no shuffle;
    * parallelism is the input's partitioning.
    *
    * Output: `(media_id, codec, sample_rate, channels,
    * bits_per_sample, n_frames, duration_ms, n_bytes)`. */
  def decodeAudio(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes"): DataFrame = {
    val in = media.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.map { case (id, rawBytes) =>
        val b = if (rawBytes == null) Array.emptyByteArray else rawBytes
        parseWav(b) match {
          case Some(w) =>
            val codec = w.fmtTag match {
              case 1 => "pcm"
              case 3 => "ieee_float"
              case 6 => "alaw"
              case 7 => "mulaw"
              case t => s"fmt_$t"
            }
            val frames = w.dataSize / w.blockAlign
            DecodedAudio(id, Some(codec), Some(w.rate.toInt),
              Some(w.channels), Some(w.bits), Some(frames),
              Some(frames * 1000L / w.rate), b.length.toLong)
          case None =>
            DecodedAudio(id, None, None, None, None, None, None,
              b.length.toLong)
        }
      }
    }(Encoders.product[DecodedAudio]).toDF()
  }

  /** A validated WAV header: `fmt ` fields plus the located data chunk. */
  private case class WavHeader(fmtTag: Int, channels: Int, rate: Long,
      blockAlign: Int, bits: Int, dataOff: Int, dataSize: Long)

  /** The RIFF chunk walk shared by [[decodeAudio]] and
    * [[audioPerceptualHashes]]: word-aligned (odd-sized chunks pad one
    * byte), stops once both `fmt ` and `data` are seen; returns None —
    * the quarantine — for non-RIFF payloads, truncated headers,
    * declared data exceeding the payload, and nonsensical fmt fields
    * (zero rate/channels, blockAlign ≠ channels·bits/8). */
  private def parseWav(b: Array[Byte]): Option[WavHeader] = {
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    try {
      if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") None
      else {
        var pos = 12
        var fmt: Option[(Int, Int, Long, Int, Int)] = None
        var data: Option[(Int, Long)] = None
        while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
          val id4 = tag(pos); val size = u32(pos + 4)
          if (id4 == "fmt " && size >= 16 && pos + 24 <= b.length)
            fmt = Some((u16(pos + 8), u16(pos + 10), u32(pos + 12),
              u16(pos + 20), u16(pos + 22)))
          // a data chunk whose declared bytes exceed the payload is
          // a truncated scrape → quarantine (None stays None)
          if (id4 == "data") {
            if (pos + 8 + size <= b.length) data = Some((pos + 8, size))
            else pos = b.length // force quarantine exit
          }
          pos += 8 + size.toInt + (size.toInt & 1)
        }
        (fmt, data) match {
          case (Some((af, ch, rate, blockAlign, bits)), Some((off, ds)))
              if ch > 0 && rate > 0 && blockAlign > 0 &&
                blockAlign == ch * bits / 8 =>
            Some(WavHeader(af, ch, rate, blockAlign, bits, off, ds))
          case _ => None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio QA-gate report — [[qaReport]]'s shape over [[decodeAudio]]'s
    * REAL header metadata: per-ingest-check pass rates in exact ppm.
    * Checks: decodable container, 16-bit PCM (the training-ready
    * encoding), ≥ 16 kHz sample rate (speech-model floor), ≥ 10 ms of
    * audio (an empty or header-only clip is a scrape artifact).
    * Scan-stage decode + stack melt + one checks-sized aggregate. */
  def audioQaReport(media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes"): DataFrame = {
    val melted = decodeAudio(media, idCol, binCol).select(expr(
      """stack(4,
        |  'decodable', codec IS NOT NULL,
        |  'pcm16', codec = 'pcm' AND bits_per_sample = 16,
        |  'rate16k', sample_rate >= 16000,
        |  'min_duration', duration_ms >= 10
        |) AS (check_name, passed)""".stripMargin))
    melted.groupBy(col("check_name"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("passed"), 1L)), lit(0L)).as("n_pass"))
      .select(col("check_name"), col("n"), col("n_pass"),
        expr("CAST(CAST(n_pass AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)")
          .as("pass_ppm"))
  }

  /** REAL video container decode — MP4/ISO-BMFF box walking in pure
    * JDK byte arithmetic, completing the image/audio/video trio
    * ([[decodeImages]] / [[decodeAudio]] / this). Header-only, the
    * same three disciplines:
    *
    *  - the top-level box walk reads `ftyp` (major brand) and recurses
    *    ONE level into `moov` for `mvhd` (timescale + duration, both
    *    version 0 u32 and version 1 u64 layouts) and the `trak` count
    *    — it never touches `mdat`, so cost is O(box headers), not
    *    O(payload);
    *  - QUARANTINE, never a failed job: non-BMFF payloads, truncated
    *    boxes, `size`=1 largesize overruns, zero/negative box sizes,
    *    missing `mvhd`, and zero timescale all yield all-NULL rows;
    *  - exact integers: `duration_ms` = duration·1000 / timescale
    *    (floor), replayable by any SQL engine.
    *
    * Codec-level decode (H.264/H.265/AAC frames inside `mdat`) needs
    * external libraries absent here — the container row is exactly
    * what a curation pipeline needs to QA, dedup by metadata, budget,
    * and route payloads to a second-pass decoder fleet.
    *
    * Output: `(media_id, brand, timescale, duration_ms, n_tracks,
    * n_bytes)`. Scan-stage `mapPartitions` projection, no shuffle. */
  def decodeVideo(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes"): DataFrame = {
    val in = media.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.map { case (id, rawBytes) =>
        val b = if (rawBytes == null) Array.emptyByteArray else rawBytes
        def u8(i: Int): Long = (b(i) & 0xff).toLong
        def u32(i: Int): Long =
          (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
        def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
        def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
        val decoded: Option[DecodedVideo] =
          try {
            var brand: Option[String] = None
            var mvhd: Option[(Long, Long)] = None // (timescale, duration)
            var tracks = 0
            var sawFtyp = false
            var bad = false
            // walk boxes in [from, to); moov recursion uses the same walk
            def walk(from: Int, to: Int, depth: Int): Unit = {
              var pos = from
              while (!bad && pos + 8 <= to) {
                val size0 = u32(pos)
                val typ = tag(pos + 4)
                // size 1 → 64-bit largesize; size 0 → box runs to EOF
                val (hdr, size) =
                  if (size0 == 1 && pos + 16 <= to) (16, u64(pos + 8))
                  else if (size0 == 0) (8, (to - pos).toLong)
                  else (8, size0)
                if (size < hdr || pos + size > to) { bad = true }
                else {
                  typ match {
                    case "ftyp" if depth == 0 && size >= hdr + 4 =>
                      sawFtyp = true; brand = Some(tag(pos + hdr))
                    case "moov" if depth == 0 =>
                      walk(pos + hdr, (pos + size).toInt, 1)
                    case "mvhd" if depth == 1 && size >= hdr + 4 =>
                      val v = u8(pos + hdr)
                      // v0: ctime/mtime u32 → timescale@+8, duration@+12
                      // v1: ctime/mtime u64 → timescale@+16, duration@+20
                      if (v == 0 && size >= hdr + 20)
                        mvhd = Some((u32(pos + hdr + 12), u32(pos + hdr + 16)))
                      else if (v == 1 && size >= hdr + 32)
                        mvhd = Some((u32(pos + hdr + 20), u64(pos + hdr + 24)))
                      else bad = true
                    case "trak" if depth == 1 => tracks += 1
                    case _ => // skipped box (mdat, free, udta, …)
                  }
                  pos += size.toInt
                }
              }
            }
            if (b.length < 12) None
            else {
              walk(0, b.length, 0)
              mvhd match {
                case Some((ts, dur))
                    if !bad && sawFtyp && ts > 0 && dur >= 0 &&
                      dur <= Long.MaxValue / 1000L =>
                  Some(DecodedVideo(id, brand, Some(ts),
                    Some(dur * 1000L / ts), Some(tracks), b.length.toLong))
                case _ => None
              }
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        decoded.getOrElse(
          DecodedVideo(id, None, None, None, None, b.length.toLong))
      }
    }(Encoders.product[DecodedVideo]).toDF()
  }

  /** Video QA-gate report — [[audioQaReport]]'s shape over
    * [[decodeVideo]]'s REAL container metadata: per-ingest-check pass
    * rates in exact ppm. Checks: decodable container (quarantined rows
    * fail every gate — the NULL-fails contract), ≥ 2 tracks (a
    * single-track file is missing its audio or video stream),
    * timescale ≥ 1000 units/s (sub-kHz timescales mark legacy or
    * audio-only containers a video pipeline routes elsewhere), and
    * ≥ 2 s of media (a shorter clip is a scrape artifact or a preview
    * stub). Scan-stage decode + stack melt + one checks-sized
    * aggregate — the m5/m14 plan shape, no data-sized shuffle. */
  def videoQaReport(media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes"): DataFrame = {
    val melted = decodeVideo(media, idCol, binCol).select(expr(
      """stack(4,
        |  'decodable', brand IS NOT NULL,
        |  'multi_track', n_tracks >= 2,
        |  'timescale1k', timescale >= 1000,
        |  'min_duration', duration_ms >= 2000
        |) AS (check_name, passed)""".stripMargin))
    melted.groupBy(col("check_name"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("passed"), 1L)), lit(0L)).as("n_pass"))
      .select(col("check_name"), col("n"), col("n_pass"),
        expr("CAST(CAST(n_pass AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)")
          .as("pass_ppm"))
  }

  /** Audio perceptual hash — the AUDIO twin of [[perceptualHashes]]'
    * dHash, over REAL decoded PCM samples (16-bit mono PCM is pure JDK
    * byte arithmetic; no codec library needed): byte-exact content
    * dedup misses the same clip re-mastered at a different volume,
    * but the SIGN PATTERN of the energy envelope's gradient survives
    * exactly that transform —
    *
    *  1. the data chunk's int16 samples are split into 65 time blocks
    *     with floor boundaries (block r covers frames
    *     [⌊r·n/65⌋, ⌊(r+1)·n/65⌋) — all-integer, any n ≥ 65);
    *  2. block energy = Σ|sample| (exact integer; L1, not L2 — no
    *     squaring overflow, same ordering under volume scaling);
    *  3. bit r = [e(r+1)·n(r) > e(r)·n(r+1)], compared
    *     cross-multiplied so unequal block sizes never divide — 64
    *     bits of temporal energy-gradient signs. A clip scaled by any
    *     a > 0 scales every energy by a: the bits — including ties —
    *     are IDENTICAL, which is the volume-invariance contract;
    *  4. packed as four 16-bit band keys (bit r → band r/16, bit
    *     r mod 16) — directly the LSH bands of [[audioNearDupPairs]],
    *     replayable in any SQL engine (no signed-bit hazard).
    *
    * Non-PCM / non-mono / non-16-bit payloads, quarantined containers,
    * and clips shorter than 65 frames yield all-NULL bands (the
    * [[decodeAudio]] contract — stereo mixdown and other encodings are
    * a second-pass decoder's job; the gate must never die). Scale
    * shape: scan-stage mapPartitions projection, no shuffle. */
  def audioPerceptualHashes(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes"): DataFrame = {
    val blocks = 65
    val in = media.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.map { case (id, rawBytes) =>
        val b = if (rawBytes == null) Array.emptyByteArray else rawBytes
        val hashed = parseWav(b) match {
          case Some(w) if w.fmtTag == 1 && w.channels == 1 && w.bits == 16 &&
              w.dataSize / w.blockAlign >= blocks =>
            val n = (w.dataSize / 2L).toInt
            val e = new Array[Long](blocks)
            val cnt = new Array[Long](blocks)
            var j = 0
            while (j < n) {
              // int16 LE, sign-extended
              val s = ((b(w.dataOff + 2 * j) & 0xff) |
                (b(w.dataOff + 2 * j + 1) << 8)).toShort.toInt
              val blk = ((j.toLong * blocks) / n).toInt
              e(blk) += math.abs(s); cnt(blk) += 1
              j += 1
            }
            // cross-multiplied compare, exact at ANY clip length:
            // e ≤ 32768·n, so e·cnt can pass 2⁶³ past ~100 s at 48 kHz
            // — fall back to BigInt only when the long product would
            // wrap (64 compares per clip; the sample loop dominates)
            def gt(x: Long, y: Long, p: Long, q: Long): Boolean =
              if ((y == 0 || x <= Long.MaxValue / y) &&
                  (q == 0 || p <= Long.MaxValue / q)) x * y > p * q
              else BigInt(x) * BigInt(y) > BigInt(p) * BigInt(q)
            def band(i: Int): Int = {
              var v = 0
              var r = 16 * i
              while (r < 16 * i + 16) {
                if (gt(e(r + 1), cnt(r), e(r), cnt(r + 1))) v |= 1 << (r % 16)
                r += 1
              }
              v
            }
            Some(PerceptualHash(id, Some(band(0)), Some(band(1)),
              Some(band(2)), Some(band(3))))
          case _ => None
        }
        hashed.getOrElse(PerceptualHash(id, None, None, None, None))
      }
    }(Encoders.product[PerceptualHash]).toDF()
  }

  /** Hamming-banded audio near-dup pairs over
    * [[audioPerceptualHashes]] — [[perceptualNearDupPairs]]' pipeline
    * verbatim (pigeonhole-exact recall for Hamming ≤ 3 over 4 bands,
    * capped band buckets, exact popcount verify), pointed at the
    * volume-invariant energy-gradient hash. Quarantined clips
    * (all-NULL bands) never enter the join. */
  def audioNearDupPairs(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes", maxHamming: Int = 3,
      bandCap: Int = 100000,
      capStats: Option[Dedup.CapStats] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded recall is exact only for maxHamming in [0, 3], got $maxHamming")
    bandedHammingPairs(
      audioPerceptualHashes(media, idCol, binCol).where(col("b0").isNotNull),
      (0 until 4).map(i => s"b$i"), maxHamming, bandCap, capStats)
  }

  /** The 256-bit WEB-SCALE variant of [[audioPerceptualHashes]] — the
    * audio twin of [[perceptualHashesDeep]]: 257 time blocks → 256
    * energy-gradient sign bits packed as EIGHT 32-bit band keys (2³²
    * key space per band → flat occupancy at any realistic corpus; the
    * measured 4×16-bit bands saturate like m9's past ~10⁶ clips —
    * SCALE.md round 13). Same volume-invariance contract, same
    * quarantine classes (plus clips shorter than 257 frames — at
    * 16 kHz that is 16 ms, below any trainable clip). */
  def audioPerceptualHashesDeep(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes"): DataFrame = {
    val blocks = 257
    val in = media.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.map { case (id, rawBytes) =>
        val b = if (rawBytes == null) Array.emptyByteArray else rawBytes
        val hashed = parseWav(b) match {
          case Some(w) if w.fmtTag == 1 && w.channels == 1 && w.bits == 16 &&
              w.dataSize / w.blockAlign >= blocks =>
            val n = (w.dataSize / 2L).toInt
            val e = new Array[Long](blocks)
            val cnt = new Array[Long](blocks)
            var j = 0
            while (j < n) {
              val s = ((b(w.dataOff + 2 * j) & 0xff) |
                (b(w.dataOff + 2 * j + 1) << 8)).toShort.toInt
              val blk = ((j.toLong * blocks) / n).toInt
              e(blk) += math.abs(s); cnt(blk) += 1
              j += 1
            }
            def gt(x: Long, y: Long, p: Long, q: Long): Boolean =
              if ((y == 0 || x <= Long.MaxValue / y) &&
                  (q == 0 || p <= Long.MaxValue / q)) x * y > p * q
              else BigInt(x) * BigInt(y) > BigInt(p) * BigInt(q)
            def band(i: Int): Long = {
              var v = 0L
              var r = 32 * i
              while (r < 32 * i + 32) {
                if (gt(e(r + 1), cnt(r), e(r), cnt(r + 1))) v |= 1L << (r % 32)
                r += 1
              }
              v
            }
            Some(PerceptualHashDeep(id, Some(band(0)), Some(band(1)),
              Some(band(2)), Some(band(3)), Some(band(4)), Some(band(5)),
              Some(band(6)), Some(band(7))))
          case _ => None
        }
        hashed.getOrElse(PerceptualHashDeep(id, None, None, None, None,
          None, None, None, None))
      }
    }(Encoders.product[PerceptualHashDeep]).toDF()
  }

  /** Hamming-banded pairs over [[audioPerceptualHashesDeep]] — the
    * web-scale audio route (pigeonhole-exact recall for Hamming ≤ 7
    * over 8 bands, the m11 discipline). */
  def audioNearDupPairsDeep(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes", maxHamming: Int = 7,
      bandCap: Int = 100000,
      capStats: Option[Dedup.CapStats] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"banded recall is exact only for maxHamming in [0, 7], got $maxHamming")
    bandedHammingPairs(
      audioPerceptualHashesDeep(media, idCol, binCol)
        .where(col("b0").isNotNull),
      (0 until 8).map(i => s"b$i"), maxHamming, bandCap, capStats)
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

  /** Perceptual hash (difference hash / dHash) over REAL decoded
    * rasters — the media twin of MinHash: byte-exact content dedup
    * ([[Text.docHash]] on the payload) misses the same image
    * re-encoded, resized, or slightly retouched; the dHash of the
    * DECODED pixels survives exactly those transforms. Full-raster
    * `ImageIO.read` (O(pixels) per item — unlike [[decodeImages]]'
    * header-only scan, this is the step one budgets decode CPU for),
    * then:
    *
    *  1. luminance signal = the raw r + g + b channel sum (3× mean
    *     gray, summed WITHOUT per-pixel truncation) over the sRGB
    *     channels `getRGB` returns for ANY source layout (palette,
    *     gray, RGBA) — the hash is a function of rendered pixels, not
    *     container encoding;
    *  2. an 8-row × 9-column area downsample with floor boundaries
    *     (block (r,c) covers x ∈ [⌊cW/9⌋, ⌊(c+1)W/9⌋), y likewise /8)
    *     — all-integer, any W ≥ 9, H ≥ 8;
    *  3. bit(r,c) = [mean(r,c+1) > mean(r,c)], compared
    *     cross-multiplied (`s₂n₁ > s₁n₂`) so no division ever rounds —
    *     64 bits of horizontal gradient signs, the classic dHash;
    *  4. packed as four 16-bit band keys (two rows each) — directly
    *     the LSH bands of [[perceptualNearDupPairs]], and exactly
    *     replayable in any SQL engine (no signed-bit-63 hazard).
    *
    * Undecodable payloads, NULL payloads, and rasters smaller than the
    * 9×8 grid quarantine (all-NULL bands) — the [[decodeImages]]
    * contract: one corrupt scrape must not kill a 100 TB sweep.
    *
    * Scale shape: scan-stage mapPartitions projection, no shuffle;
    * decode parallelism is the input's partitioning. */
  def perceptualHashes(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes"): DataFrame = {
    val in = media.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.map { case (id, rawBytes) =>
        decodeBlockSums(rawBytes, rows = 8, cols = 9) match {
          case Some((s, n)) =>
            def band(b: Int): Int = {
              var v = 0
              var rr = 2 * b
              while (rr <= 2 * b + 1) {
                var c = 0
                while (c < 8) {
                  if (s(rr)(c + 1) * n(rr)(c) > s(rr)(c) * n(rr)(c + 1))
                    v |= 1 << ((rr % 2) * 8 + c)
                  c += 1
                }
                rr += 1
              }
              v
            }
            PerceptualHash(id, Some(band(0)), Some(band(1)), Some(band(2)),
              Some(band(3)))
          case _ => PerceptualHash(id, None, None, None, None)
        }
      }
    }(Encoders.product[PerceptualHash]).toDF()
  }

  /** Decode + block luminance sums over a `rows`×`cols` grid — the
    * shared core of the 64-bit and 256-bit dHash variants. Returns
    * NONE (the quarantine) for undecodable/NULL payloads and rasters
    * smaller than the grid; otherwise `(s, n)` with `s(r)(c)` the raw
    * r+g+b channel sum and `n(r)(c)` the pixel count of block (r,c) —
    * floor boundaries, all-integer. Σ⌊(r+g+b)/3⌋ would lose the
    * remainder per pixel; summing the RAW channel total and comparing
    * cross-multiplied is the same ordering with exact thirds (gray·3),
    * and the oracle replays it as Σgray when r=g=b (the fixtures'
    * case: acc = 3·Σgray). */
  private def decodeBlockSums(rawBytes: Array[Byte], rows: Int, cols: Int)
      : Option[(Array[Array[Long]], Array[Array[Long]])] = {
    val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
    val img =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    img match {
      case Some(im) if im.getWidth >= cols && im.getHeight >= rows =>
        val w = im.getWidth
        val h = im.getHeight
        val s = Array.ofDim[Long](rows, cols)
        val n = Array.ofDim[Long](rows, cols)
        var r = 0
        while (r < rows) {
          val y0 = r * h / rows; val y1 = (r + 1) * h / rows
          var c = 0
          while (c < cols) {
            val x0 = c * w / cols; val x1 = (c + 1) * w / cols
            var acc = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = im.getRGB(x, y)
                acc += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            s(r)(c) = acc
            n(r)(c) = (y1 - y0).toLong * (x1 - x0)
            c += 1
          }
          r += 1
        }
        Some((s, n))
      case _ => None
    }
  }

  /** 256-bit dHash — [[perceptualHashes]] at a 16-row × 17-column grid,
    * packed as EIGHT 32-bit band keys (two rows each, bit
    * `(r%2)·16 + c`). This is the WEB-SCALE variant: the round-10 d5
    * octave measured that any fixed bounded band-key space saturates
    * quadratically as the corpus grows, and the 64-bit hash's 4×2¹⁶
    * bands are exactly that class (~N/65k expected occupancy per
    * bucket at 10⁹ images). Deepening the hash moves the band keys to
    * a 2³² space — ~N/4.3·10⁹ occupancy, the d2 "unbounded key space,
    * flat occupancy" property — while KEEPING pigeonhole-exact recall:
    * 8 bands tolerate Hamming ≤ 7 of 256 bits (2.7% of bits, vs the
    * 64-bit variant's 3/64 = 4.7% — the deeper grid is more sensitive
    * per retouch, so the relative tolerance is roughly preserved). No
    * signed-bit hazard: 32-bit keys ride in longs on both engines.
    *
    * Quarantine: rasters smaller than 17×16, undecodable, or NULL
    * payloads → all-NULL bands. Scan-stage mapPartitions, no
    * shuffle. */
  def perceptualHashesDeep(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes"): DataFrame = {
    val in = media.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.map { case (id, rawBytes) =>
        decodeBlockSums(rawBytes, rows = 16, cols = 17) match {
          case Some((s, n)) =>
            val bands = Array.tabulate(8) { b =>
              var v = 0L
              var rr = 2 * b
              while (rr <= 2 * b + 1) {
                var c = 0
                while (c < 16) {
                  if (s(rr)(c + 1) * n(rr)(c) > s(rr)(c) * n(rr)(c + 1))
                    v |= 1L << ((rr % 2) * 16 + c)
                  c += 1
                }
                rr += 1
              }
              v
            }
            PerceptualHashDeep(id, Some(bands(0)), Some(bands(1)),
              Some(bands(2)), Some(bands(3)), Some(bands(4)),
              Some(bands(5)), Some(bands(6)), Some(bands(7)))
          case _ => PerceptualHashDeep(id, None, None, None, None, None,
            None, None, None)
        }
      }
    }(Encoders.product[PerceptualHashDeep]).toDF()
  }

  /** Hamming-banded perceptual near-dup pairs — the d2 MinHash+LSH
    * discipline applied to [[perceptualHashes]]' bits: candidates are
    * images sharing at least one of the four 16-bit bands (an equi-join
    * per band — by pigeonhole EXACT recall for Hamming ≤ 3, since 4
    * mismatching bands need ≥ 4 differing bits), verified by the exact
    * Hamming distance over all 64 bits. Same image re-encoded
    * (PNG↔BMP) hashes identically (Hamming 0); light retouches flip a
    * few gradient signs and still pair; genuinely different images
    * disagree in far more than `maxHamming` bits.
    *
    * Scale shape: the hash table is one 4-band explode (4 rows per
    * image), the candidate join is an equi-join on (band, key);
    * `bandCap` drops (band, key) buckets holding more than that many
    * images ([[Dedup.capBuckets]] — the d2/d5 quadratic-candidate
    * guard, with [[graft.operators.Dedup.CapStats]] recall
    * accounting: hot monoculture keys like single-color thumbnails
    * would otherwise go cap²-quadratic on one shuffle key); the
    * verify join touches only candidate ids. The corpus's pixel
    * payloads never move: hashing is scan-stage, everything after
    * rides 4-integer rows.
    *
    * SCALE LIMIT, measured at the round-11 octaves (SCALE.md): the 4
    * band keys live in a FIXED 2¹⁶ space, so occupancy — and with it
    * Σocc² candidate work — grows quadratically once the corpus
    * passes ~10⁵-10⁶ images, even with perfectly uniform keys; the
    * cap bounds the damage (with accounting) but drops recall on hot
    * buckets. At web scale route to [[perceptualNearDupPairsDeep]]:
    * 2³² band keys keep occupancy flat at any realistic corpus.
    *
    * Output: `(id_a, id_b, hamming)`, `hamming ≤ maxHamming`. */
  def perceptualNearDupPairs(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes", maxHamming: Int = 3,
      bandCap: Int = 100000,
      capStats: Option[Dedup.CapStats] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded recall is exact only for maxHamming in [0, 3], got $maxHamming")
    bandedHammingPairs(
      perceptualHashes(media, idCol, binCol).where(col("b0").isNotNull),
      (0 until 4).map(i => s"b$i"), maxHamming, bandCap, capStats)
  }

  /** The banded-Hamming pair pipeline shared by the 64-bit (4 bands)
    * and 256-bit (8 bands) variants: checkpoint the hash table, explode
    * band keys, cap hot (band, key) buckets ([[Dedup.capBuckets]]),
    * candidate equi-join on (band, key), verify by exact popcount over
    * every band — one implementation so the hint/cap/checkpoint
    * discipline cannot drift between variants. The hash table is
    * corpus-row-sized: the verify joins co-partition on the candidate
    * ids (the t9/d23 grows-with-the-corpus rule), never broadcast. */
  private def bandedHammingPairs(
      hashes: DataFrame, bandNames: Seq[String], maxHamming: Int,
      bandCap: Int, capStats: Option[Dedup.CapStats]): DataFrame = {
    val hs = hashes
      .localCheckpoint() // shared by the band explode and both verify sides
    val bands = Dedup.capBuckets(
      hs.select(col("media_id"), posexplode(array(bandNames.map(col): _*)))
        .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bk"),
      Seq("_band", "_bk"), bandCap, capStats)
      .localCheckpoint()
    val cand = bands.as("x")
      .join(bands.as("y").hint("shuffle_hash"),
        col("x._band") === col("y._band") && col("x._bk") === col("y._bk") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"))
      .distinct()
    val ha = hs.select(col("media_id").as("id_a") +:
      bandNames.zipWithIndex.map { case (b, i) => col(b).as(s"_a$i") }: _*)
    val hb = hs.select(col("media_id").as("id_b") +:
      bandNames.zipWithIndex.map { case (b, i) => col(b).as(s"_c$i") }: _*)
    cand.join(ha.hint("shuffle_hash"), "id_a").join(hb.hint("shuffle_hash"), "id_b")
      .select(col("id_a"), col("id_b"),
        bandNames.indices.map(i =>
          bit_count(col(s"_a$i").bitwiseXOR(col(s"_c$i"))))
          .reduce(_ + _).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Hamming-banded near-dup pairs over the 256-bit
    * [[perceptualHashesDeep]] — the WEB-SCALE route: candidates share
    * at least one of the EIGHT 32-bit bands (pigeonhole-exact recall
    * for Hamming ≤ 7 of 256 bits), verified by the exact popcount over
    * all eight bands. Re-encoded copies of one raster (PNG↔BMP) still
    * hash identically; the deeper grid flips proportionally more bits
    * per retouch, so the relative tolerance (≤ 2.7% of bits) roughly
    * matches the 64-bit variant's 3/64.
    *
    * Scale shape: one 8-band explode, candidate equi-join on
    * (band, key) with keys in a 2³² space — expected occupancy
    * ~N/4.3·10⁹ per band bucket, i.e. FLAT through any realistic
    * image corpus (the d2 md5-band property, measured flat at the
    * round-11 octaves where the 16-bit variant went quadratic);
    * `bandCap` + [[graft.operators.Dedup.CapStats]] still guard
    * genuine monocultures (identical rasters hash identically at any
    * depth — run exact payload dedup first). Payloads never move.
    *
    * Output: `(id_a, id_b, hamming)`, `hamming ≤ maxHamming`. */
  def perceptualNearDupPairsDeep(
      media: DataFrame, idCol: String = "media_id",
      binCol: String = "bytes", maxHamming: Int = 7,
      bandCap: Int = 100000,
      capStats: Option[Dedup.CapStats] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"8-banded recall is exact only for maxHamming in [0, 7], got $maxHamming")
    bandedHammingPairs(
      perceptualHashesDeep(media, idCol, binCol).where(col("b0").isNotNull),
      (0 until 8).map(i => s"b$i"), maxHamming, bandCap, capStats)
  }
}
