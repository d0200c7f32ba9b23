package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media payloads ride as opaque BinaryType
 * columns with a typed metadata struct; decode / feature-extraction runs as
 * a per-partition batch pipeline over the binary payloads (the reference
 * decodes via per-format datasource readers, utils/url.py:77-248).
 *
 * IMAGE and AUDIO decode are REAL: the JDK ships actual codecs —
 * `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP) and RIFF/WAV PCM — so
 * `decodeImages` / `resizeImages` / `patchFeatures` / `decodeWav` /
 * `audioFeatures` run true decode/transcode in executors, one codec
 * instance per partition, no driver collect. VIDEO is covered for
 * MJPEG-style frame streams (`sampleFrames`: every frame an
 * independently-coded image the JDK can decode); inter-frame codecs
 * (H.264…) have no JVM decoder — `decodeStub` keeps that pipeline shape
 * (schema, partitioning, batch iteration, typed Encoders) real and
 * testable until an FFI decoder is swapped in.
 */
object Multimodal {

  /** One media payload row (binary + typed metadata). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted features per payload. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, head_md5: String,
      fake_width: Int, fake_height: Int)

  /** Attach a binary payload column (here: the UTF-8 text bytes standing in
    * for an image/audio blob) + metadata struct. */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol)).cast(LongType).as("n_bytes"))

  /** STUB decode: deterministic features from the payload bytes. Replace the
    * body with a real decoder; the mapPartitions shape (per-partition batch
    * loop, typed Encoders, no driver collect) is the production plumbing. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // One digest instance per partition — the "open codec once per batch"
      // pattern a real decoder needs.
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val head = r.payload.take(32)
        val digest = md.digest(head).map("%02x".format(_)).mkString
        // Fake dimensions derived from content so they are deterministic.
        val w = 16 + (math.floorMod(r.n_bytes, 64L)).toInt
        MediaFeatures(r.doc_id, r.payload.length.toLong, digest, w, w / 2)
      }
    }
  }

  // ---------------------------------------------------------- real codecs

  /** Decoded image features. `mean_gray` is the rounded mean luminance
    * (ITU-R BT.601 integer weights over 8-bit RGB); `format` is sniffed
    * from the payload magic, not trusted metadata. */
  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      format: String, mean_gray: Long)

  /** One re-encoded image payload. */
  final case class ImageOut(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) "jpeg"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else "unknown"

  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    img
  }

  /** Rounded mean luminance (BT.601 integer luma) of a decoded image. */
  private def meanGray(img: java.awt.image.BufferedImage): Long = {
    var sum = 0L
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) +
          29 * (rgb & 0xFF)) >> 8
        x += 1
      }
      y += 1
    }
    math.round(sum.toDouble / (w.toLong * h))
  }

  /** REAL image decode via the JDK's ImageIO codecs: dimensions, sniffed
    * format, mean luminance — computed per partition in executors. Rows
    * whose payload does not decode are dropped (`strict = false`) or fail
    * the job (`strict = true`); a training-data pipeline wants the filter,
    * an ingest gate wants the failure. */
  def decodeImages(spark: SparkSession, media: DataFrame,
      strict: Boolean = false): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val img = readImage(r.payload)
          Some(ImageFeatures(r.doc_id, img.getWidth, img.getHeight,
            sniffFormat(r.payload), meanGray(img)))
        } catch {
          case e: Exception if !strict => None
          case e: Exception => throw new IllegalArgumentException(
            s"doc ${r.doc_id}: image decode failed", e)
        }
      }
    }
  }

  /** REAL resize: decode, scale so max(width,height) == maxDim (never
    * upscale), bilinear interpolation, re-encode PNG. The distributed
    * transcode pass of a vision-data pipeline. */
  def resizeImages(spark: SparkSession, media: DataFrame, maxDim: Int): Dataset[ImageOut] = {
    import spark.implicits._
    require(maxDim >= 1, "maxDim >= 1")
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val img = readImage(r.payload)
          val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
          val (nw, nh) = (math.max(1, math.round(img.getWidth * scale).toInt),
            math.max(1, math.round(img.getHeight * scale).toInt))
          val out = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, nw, nh, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(ImageOut(r.doc_id, bos.toByteArray, nw, nh))
        } catch { case _: Exception => None }
      }
    }
  }

  /** Per-image patch-grid luma vector. */
  final case class PatchFeatures(doc_id: Long, features: Array[Double])

  /** FEATURE-EXTRACT step: decode and reduce each image to a grid²-dim
    * vector of per-patch mean luminance — the cheap classic visual
    * embedding. The output column feeds the ANN / semantic-dedup operators
    * directly (Similarity.*, Quantization.*), completing the
    * decode → feature-extract → embed → dedup/search pipeline. Patch (i,j)
    * covers pixel rows [i·h/g, (i+1)·h/g) × cols [j·w/g, (j+1)·w/g)
    * (integer bounds), index = i·g + j. */
  def patchFeatures(spark: SparkSession, media: DataFrame, grid: Int,
      strict: Boolean = false): Dataset[PatchFeatures] = {
    import spark.implicits._
    require(grid >= 1, "grid >= 1")
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val img = readImage(r.payload)
          val (w, h) = (img.getWidth, img.getHeight)
          require(w >= grid && h >= grid, s"image ${w}x$h smaller than grid $grid")
          val feats = new Array[Double](grid * grid)
          var i = 0
          while (i < grid) {
            var j = 0
            while (j < grid) {
              val (y0, y1) = (i * h / grid, (i + 1) * h / grid)
              val (x0, x1) = (j * w / grid, (j + 1) * w / grid)
              var sum = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  sum += (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) +
                    29 * (rgb & 0xFF)) >> 8
                  x += 1
                }
                y += 1
              }
              feats(i * grid + j) = sum.toDouble / ((y1 - y0).toLong * (x1 - x0))
              j += 1
            }
            i += 1
          }
          Some(PatchFeatures(r.doc_id, feats))
        } catch {
          case e: Exception if !strict => None
          case e: Exception => throw new IllegalArgumentException(
            s"doc ${r.doc_id}: patch feature extraction failed", e)
        }
      }
    }
  }

  // -------------------------------------------------------------- video

  /** One sampled, decoded video frame. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, ts_ms: Long,
      width: Int, height: Int, mean_gray: Long)

  /** Serialize an MJPEG/MPNG-style frame stream — magic "GMJ1",
    * u32 frame count, then per frame (u32 ts_ms, u32 len, image payload),
    * all big-endian. Motion-JPEG-style streams (every frame an
    * independently-coded image) are the one video family the JDK can REALLY
    * decode; inter-frame codecs (H.264…) have no JDK demuxer/decoder — the
    * sampling PLUMBING below (schema, per-frame fan-out, stride math,
    * partition shape) is codec-agnostic and is what a real decoder would
    * plug into. */
  def writeFrameStream(frames: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val total = 8 + frames.map(f => 8 + f._2.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.put("GMJ1".getBytes("US-ASCII")).putInt(frames.size)
    for ((ts, payload) <- frames) {
      bb.putInt(ts.toInt).putInt(payload.length).put(payload)
    }
    bb.array()
  }

  /** Frame sampling over video payloads: demux the frame stream, KEEP only
    * every `everyNth` frame, decode kept frames via ImageIO (skipped frames
    * are never decoded — the whole point of sampling: a 30 fps corpus
    * sampled at stride 30 decodes 1/30th of the pixels), emit one row per
    * sampled frame. Fan-out is a partition-preserving flatMap — no shuffle;
    * downstream repartitioning is the caller's choice when frame rows
    * outnumber documents enough to skew partitions. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyNth: Int,
      strict: Boolean = false): Dataset[FrameRow] = {
    import spark.implicits._
    require(everyNth >= 1, "everyNth >= 1")
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val bb = java.nio.ByteBuffer.wrap(r.payload)
          val magic = new Array[Byte](4); bb.get(magic)
          require(new String(magic, "US-ASCII") == "GMJ1",
            "bad frame-stream magic — not a GMJ1 payload")
          val n = bb.getInt
          (0 until n).iterator.flatMap { idx =>
            val ts = bb.getInt.toLong & 0xFFFFFFFFL // declared u32: no sign extension
            val len = bb.getInt
            if (idx % everyNth != 0) { // skip without decoding
              bb.position(bb.position() + len); None
            } else {
              val payload = new Array[Byte](len); bb.get(payload)
              val img = readImage(payload)
              Some(FrameRow(r.doc_id, idx, ts, img.getWidth, img.getHeight,
                meanGray(img)))
            }
          }.toSeq
        } catch {
          case e: Exception if !strict => Nil
          case e: Exception => throw new IllegalArgumentException(
            s"doc ${r.doc_id}: frame-stream decode failed", e)
        }
      }
    }
  }

  /** Decoded WAV/PCM features. `rms` is over normalized [-1, 1] samples of
    * the first channel. */
  final case class WavFeatures(doc_id: Long, channels: Int, sample_rate: Int,
      bits_per_sample: Int, n_frames: Long, duration_ms: Long, rms: Double)

  /** REAL RIFF/WAV PCM decode (byte-level per the public WAVE format spec —
    * deterministic, no AudioSystem service lookup): fmt chunk → layout,
    * data chunk → samples; 8/16/24/32-bit integer PCM. */
  def decodeWav(spark: SparkSession, media: DataFrame,
      strict: Boolean = false): Dataset[WavFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        try Some(parseWav(r.doc_id, r.payload))
        catch {
          case e: Exception if !strict => None
          case e: Exception => throw new IllegalArgumentException(
            s"doc ${r.doc_id}: wav decode failed", e)
        }
      }
    }
  }

  /** Parsed RIFF/WAVE layout — the SINGLE demux both decode paths share
    * (one parser to harden; a second copy already grew a divergent bug). */
  private final case class WavLayout(channels: Int, rate: Int, bits: Int,
      dataOff: Int, dataLen: Long) {
    def frameBytes: Int = (bits / 8) * channels
    def nFrames: Long = if (frameBytes == 0) 0L else dataLen / frameBytes
  }

  private def wu16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def wu32(b: Array[Byte], i: Int): Long =
    (wu16(b, i).toLong | (wu16(b, i + 2).toLong << 16)) & 0xFFFFFFFFL

  private def demuxWav(b: Array[Byte]): WavLayout = {
    require(b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E', "not RIFF/WAVE")
    // pos/len stay Long: a corrupt u32 chunk length cast to Int went
    // NEGATIVE and stalled (or reversed) the walk — an unkillable spin on
    // hostile input. As unsigned Longs the step is always ≥ 8 (progress
    // guaranteed) and an out-of-range length fails the bounds check.
    var pos = 12L
    var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1L; var dataLen = 0L
    while (pos + 8 <= b.length && (channels == 0 || dataOff < 0)) {
      val id = new String(b, pos.toInt, 4, "US-ASCII")
      val len = wu32(b, pos.toInt + 4)
      require(pos + 8 + len <= b.length, s"corrupt chunk length $len at $pos")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len bytes) — corrupt header")
          val fmt = wu16(b, pos.toInt + 8)
          require(fmt == 1, s"non-PCM wav format tag $fmt")
          channels = wu16(b, pos.toInt + 10)
          rate = wu32(b, pos.toInt + 12).toInt
          bits = wu16(b, pos.toInt + 22)
        case "data" => dataOff = pos + 8; dataLen = len
        case _ => ()
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(channels > 0 && dataOff >= 0, "missing fmt/data chunk")
    WavLayout(channels, rate, bits, dataOff.toInt, dataLen)
  }

  /** One pass over the first channel: (rms, zero crossings, peak).
    * `needZcPeak = false` keeps decodeWav's rms-only hot loop free of the
    * abs/signum/branch cost it would otherwise pay per sample. */
  private def wavSampleStats(b: Array[Byte], l: WavLayout,
      needZcPeak: Boolean = true): (Double, Long, Double) = {
    val full = (1L << (l.bits - 1)).toDouble
    var sumSq = 0.0
    var zc = 0L
    var peak = 0.0
    var prevSign = 0
    var f = 0L
    val n = l.nFrames
    while (f < n) {
      val off = l.dataOff + (f * l.frameBytes).toInt // first channel only
      val v: Long = l.bits match {
        case 8 => (b(off) & 0xFF) - 128L // 8-bit wav is unsigned
        case 16 => wu16(b, off).toShort.toLong
        case 24 => ((wu16(b, off).toLong | ((b(off + 2) & 0xFF).toLong << 16)) << 40) >> 40
        case 32 => (wu32(b, off) << 32) >> 32
        case other => throw new IllegalArgumentException(s"unsupported PCM depth $other")
      }
      val s = v / full
      sumSq += s * s
      if (needZcPeak) {
        val a = math.abs(s)
        if (a > peak) peak = a
        val sign = java.lang.Long.signum(v)
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) zc += 1
          prevSign = sign
        }
      }
      f += 1
    }
    (if (n == 0) 0.0 else math.sqrt(sumSq / n), zc, peak)
  }

  private[graft] def parseWav(docId: Long, b: Array[Byte]): WavFeatures = {
    val l = demuxWav(b)
    val (rms, _, _) = wavSampleStats(b, l, needZcPeak = false)
    WavFeatures(docId, l.channels, l.rate, l.bits, l.nFrames,
      if (l.rate == 0) 0L else l.nFrames * 1000L / l.rate, rms)
  }

  /** Extended audio features (the audio FEATURE-EXTRACT step): RMS plus
    * zero-crossing count and normalized peak over the first channel. */
  final case class AudioFeatures(doc_id: Long, n_frames: Long, rms: Double,
      zero_crossings: Long, peak: Double)

  /** One demux + ONE sample pass per payload: rms, sign changes between
    * consecutive first-channel samples (zeros carry the previous sign) and
    * max |sample| in [-1, 1]. Same per-partition executor shape as
    * decodeWav. */
  def audioFeatures(spark: SparkSession, media: DataFrame,
      strict: Boolean = false): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val l = demuxWav(r.payload)
          val (rms, zc, peak) = wavSampleStats(r.payload, l)
          Some(AudioFeatures(r.doc_id, l.nFrames, rms, zc, peak))
        } catch {
          case e: Exception if !strict => None
          case e: Exception => throw new IllegalArgumentException(
            s"doc ${r.doc_id}: audio feature extraction failed", e)
        }
      }
    }
  }
}
