package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns with typed metadata, plus partition-wise batch
  * decode/feature-extract — the Scala analog of a Pandas-UDF
  * `mapInPandas` stage (iterator of batches per partition, fixed
  * output schema).
  *
  * The image codec path is REAL: `javax.imageio.ImageIO` ships with
  * the JDK (PNG/BMP/JPEG/GIF), so image payloads decode to actual
  * pixels — width, height, and mean luminance come from the decoded
  * raster. Payloads that don't sniff as an image, or that fail to
  * decode (truncated/corrupt), fall back to `decodeStub`, which
  * derives deterministic features from the raw bytes — the no-codec
  * fallback for media kinds (audio/video) whose codecs aren't in the
  * JDK. Everything around the codec — the media schema, the
  * mapPartitions batch shape, partitioning, the feature output
  * contract — is codec-agnostic.
  */
object MultimodalOps {

  // ImageIO defaults to a FILE-backed stream cache: every read/write
  // spills through a temp file, so a batch decode over thousands of
  // in-memory byte-array payloads churns disk for no benefit (and
  // measurably drags on a loaded box — q96 regressed ~2x under disk
  // contention). Payloads here are always heap byte arrays; cache in
  // memory. Executor-local static init, same as a cluster deploy.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata carried beside the opaque payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false))), nullable = false)))

  /** Feature-extraction output contract. `width`/`height` are the
    * decoded raster dimensions (0 when the payload didn't decode);
    * `decoded` says whether the real codec produced the features or
    * the byte-stub fallback did.
    */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("brightness", DoubleType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Pack rows into the media schema: payload bytes + derived typed
    * metadata. `kind` cycles image/audio/video deterministically.
    */
  def packMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("n_bytes"),
        (col("media_id") % 640 + 32).cast("int").as("width"),
        (col("media_id") % 480 + 32).cast("int").as("height"),
        (col("media_id") % 90000).cast("long").as("duration_ms")))

  /** No-codec fallback (audio/video kinds, corrupt images):
    * deterministic features from the raw bytes — byte-sum checksum and
    * a brightness proxy.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Double) = {
    if (payload == null) return (0L, 0.0)
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
    (sum, if (payload.length == 0) 0.0 else sum.toDouble / payload.length / 255.0)
  }

  /** Cheap magic-byte sniff so non-image payloads (the common case in
    * a mixed corpus) never touch the ImageIO machinery — the reader
    * registry scan and stream wrapper per row would dominate an
    * all-text partition otherwise.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p != null && p.length >= 8 &&
      ((p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 'B' && p(1) == 'M') ||
        (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F'))

  /** The real codec: decode via `javax.imageio` (JDK built-in:
    * PNG/BMP/JPEG/GIF) and return (width, height, mean luminance in
    * [0,1]). None when the payload isn't an image or fails to decode
    * (truncated/corrupt bytes) — callers fall back to the stub.
    */
  private[graft] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] = {
    if (!looksLikeImage(payload)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var lum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            lum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((w, h, lum.toDouble / (3.0 * w * h) / 255.0))
      }
    } catch { case _: Exception => None }
  }

  /** Deterministic solid-gray PNG — the planted fixture for the decode
    * path: a `width`x`height` raster of gray value `gray`, so the
    * decoded brightness is exactly `gray / 255.0` and an arithmetic
    * oracle can predict every decoded feature from the parameters
    * alone (PNG is lossless; no bytes need to be known ahead).
    */
  def syntheticPng(gray: Int, width: Int, height: Int): Array[Byte] = {
    require(gray >= 0 && gray <= 255 && width > 0 && height > 0,
      s"syntheticPng($gray, $width, $height) out of range")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit average-hash (aHash) of a decoded image: mean-pool the
    * luminance raster to an 8×8 grid (block boundaries at
    * floor(k·dim/8), so any size ≥ 8×8 pools exactly; an 8×8 input is
    * the identity), threshold each cell against the grid mean
    * (strictly greater), pack row-major — bit i = cell(y = i / 8,
    * x = i % 8). The standard perceptual fingerprint for image-level
    * dedup: near-duplicate images differ in a few bits, so Hamming
    * distance replaces pixel comparison. None on non-image payloads.
    */
  private[graft] def imageAHash(payload: Array[Byte]): Option[Long] = {
    if (!looksLikeImage(payload)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val cell = new Array[Long](64)
        val cnt = new Array[Long](64)
        var y = 0
        while (y < h) {
          val gy = y * 8 / h
          var x = 0
          while (x < w) {
            val gx = x * 8 / w
            val rgb = img.getRGB(x, y)
            cell(gy * 8 + gx) +=
              ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            cnt(gy * 8 + gx) += 1
            x += 1
          }
          y += 1
        }
        // exact integer threshold: cell mean > grid mean
        //   cell_i / (3·cnt_i)  >  Σ lum / (3·w·h)
        // cross-multiplied to avoid any floating point
        var total = 0L
        var i = 0
        while (i < 64) { total += cell(i); i += 1 }
        var hash = 0L
        i = 0
        while (i < 64) {
          if (cell(i) * w * h > total * cnt(i)) hash |= (1L << i)
          i += 1
        }
        Some(hash)
      }
    } catch { case _: Exception => None }
  }

  /** Deterministic 8×8 black/white pattern PNG: pixel i (row-major)
    * is white iff bit i of `bits` is set. The aHash of such an image
    * is exactly `bits` whenever `bits` is neither all-ones-in-use nor
    * degenerate (white cells sit above the mean, black below; with
    * both colors present the strict threshold reproduces the
    * pattern) — so an arithmetic oracle can predict the hash, the
    * Hamming distances, and every downstream dedup verdict from the
    * bit formula alone while the engine still decodes REAL pixels.
    */
  def syntheticPatternPng(bits: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val v = if (((bits >> i) & 1L) == 1L) 0xffffff else 0
      img.setRGB(i % 8, i / 8, v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Partition-wise batch feature extraction (the mapInPandas stage):
    * one pass per partition, rows processed as an iterator — no
    * per-row task overhead, codec state reusable across a partition.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "kind", "payload", "meta.duration_ms")
      .mapPartitions { rows =>
        // per-partition "codec init" would happen here, once
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (checksum, stubBrightness) = decodeStub(payload)
          val real = decodeImage(payload)
          val frames = (r.getAs[Long]("duration_ms") / 1000L).toInt + 1
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            if (payload == null) 0L else payload.length.toLong,
            checksum,
            real.fold(stubBrightness)(_._3),
            frames,
            real.fold(0)(_._1),
            real.fold(0)(_._2),
            real.isDefined)
        }
      }(enc)
  }

  // -------------------------------------------------------------------
  // Audio: REAL RIFF/WAVE PCM16 decode — pure JVM, no codec library.
  // -------------------------------------------------------------------

  /** Decoded audio features. `rms`/`peak`/`mean` are normalized to
    * [-1, 1] by the int16 full scale (32768).
    */
  final case class WavFeatures(sampleRate: Int, nChannels: Int,
      nFrames: Long, durationMs: Long, rms: Double, peak: Double,
      mean: Double)

  /** Output contract of [[extractAudioFeatures]]. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak_norm", DoubleType, nullable = false),
    StructField("mean_norm", DoubleType, nullable = false)))

  private def looksLikeWav(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** The real audio codec: parse a RIFF/WAVE container (chunk walk:
    * `fmt ` then `data`), require integer PCM16, and fold the samples
    * into RMS / peak / mean in one pass — a WAV decoder is ~50 lines
    * of little-endian arithmetic, so unlike image codecs it needs no
    * library at all. None on anything malformed (truncated chunk,
    * compressed format code, odd data length), so corrupt payloads
    * fall through to the byte-stub path exactly like images do.
    */
  private[graft] def decodeWav(p: Array[Byte]): Option[WavFeatures] = {
    if (!looksLikeWav(p)) return None
    def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(p, off, 4, "US-ASCII")
      val len = u32(off + 4)
      if (len < 0 || off + 8 + len > p.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val audioFormat = u16(off + 8)
        if (audioFormat != 1) return None // integer PCM only
        fmt = Some((u16(off + 10), u32(off + 12).toInt, u16(off + 22)))
      } else if (id == "data") {
        data = Some((off + 8, len.toInt))
      }
      off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((channels, rate, bits)), Some((dOff, dLen))) =>
        if (bits != 16 || channels <= 0 || rate <= 0) return None
        val blockAlign = channels * 2
        if (dLen % blockAlign != 0) return None
        val total = dLen / 2
        var i = dOff
        var sumSq = 0L
        var sumVal = 0L
        var peak = 0
        while (i + 1 < dOff + dLen) {
          val s = (u16(i) << 16) >> 16 // sign-extend int16
          sumSq += s.toLong * s
          sumVal += s
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 2
        }
        val frames = (total / channels).toLong
        Some(WavFeatures(rate, channels, frames,
          frames * 1000L / rate,
          if (total == 0) 0.0 else math.sqrt(sumSq.toDouble / total) / 32768.0,
          peak / 32768.0,
          if (total == 0) 0.0 else sumVal.toDouble / total / 32768.0))
      case _ => None
    }
  }

  /** Deterministic PCM16 WAV plant — the audio analog of
    * [[syntheticPng]]: an alternating ±`amp` square wave (`frames`
    * frames, every channel carrying the frame value), so every
    * decoded feature is closed-form in the parameters — RMS and peak
    * are exactly `amp / 32768`, mean is `amp / (frames·32768)` for
    * odd frame counts and 0 for even — and an arithmetic oracle can
    * predict the whole decode from the parameters alone.
    */
  def syntheticWav(amp: Int, frames: Int, rate: Int, channels: Int): Array[Byte] = {
    require(amp >= 0 && amp <= 32767 && frames >= 0 && rate > 0 && channels > 0,
      s"syntheticWav($amp, $frames, $rate, $channels) out of range")
    val dataLen = frames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < frames) {
      val v: Short = (if (i % 2 == 0) amp else -amp).toShort
      var c = 0
      while (c < channels) { buf.putShort(v); c += 1 }
      i += 1
    }
    buf.array()
  }

  /** Partition-wise audio feature extraction — the same mapInPandas
    * batch contract as [[extractFeatures]], with the WAV parser as
    * the codec and zeroed features as the no-decode fallback.
    */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val nBytes = if (payload == null) 0L else payload.length.toLong
          decodeWav(payload) match {
            case Some(f) => Row(r.getAs[Long]("media_id"), nBytes, true,
              f.sampleRate, f.nChannels, f.nFrames, f.durationMs,
              f.rms, f.peak, f.mean)
            case None => Row(r.getAs[Long]("media_id"), nBytes, false,
              0, 0, 0L, 0L, 0.0, 0.0, 0.0)
          }
        }
      }(enc)
  }

  // -------------------------------------------------------------------
  // Video: REAL RIFF/AVI container walk + per-frame image decode.
  // The container parse is the same chunk arithmetic as decodeWav (AVI
  // and WAVE are both RIFF forms); each video frame chunk ('##dc' /
  // '##db') holds one compressed image that the existing ImageIO path
  // decodes — MJPEG in the wild, lossless PNG in the planted fixtures
  // so the oracle stays exact arithmetic.
  // -------------------------------------------------------------------

  /** Decoded video features. `width`/`height` come from the first
    * decoded frame raster (falling back to the avih header if no frame
    * decodes); `meanBrightness` averages the per-frame mean luminance
    * over the frames that decoded.
    */
  final case class AviFeatures(nFrames: Int, decodedFrames: Int,
      width: Int, height: Int, durationMs: Long, meanBrightness: Double)

  /** Output contract of [[extractVideoFeatures]]. */
  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("decoded_frames", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("mean_brightness", DoubleType, nullable = false)))

  private def looksLikeAvi(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  /** The video "codec": walk the RIFF/AVI chunk tree (LIST chunks
    * recurse; `avih` supplies frame timing and header dimensions;
    * `##dc`/`##db` chunks are the frame payloads inside the `movi`
    * list), decode each frame through [[decodeImage]], and aggregate.
    * None on any malformed container (truncated chunk, missing `avih`,
    * zero frame chunks) — corrupt payloads fall through to the
    * byte-stub path exactly like images and audio do.
    *
    * `frameStride` decodes only every stride-th frame (indices 0,
    * stride, 2·stride, …) — the production sampling path: at 100 TB
    * nobody decodes every frame of every video; the container walk
    * (cheap pointer arithmetic) still counts ALL frames, only the
    * pixel decode (the expensive part) is sampled. `nFrames` reports
    * the container total; `decodedFrames` counts the sampled decodes.
    */
  private[graft] def decodeAvi(p: Array[Byte],
      frameStride: Int = 1): Option[AviFeatures] = {
    require(frameStride >= 1, s"frameStride must be >= 1, got $frameStride")
    if (!looksLikeAvi(p)) return None
    def u32(i: Int): Long = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    var microPerFrame = 0L
    var headerW = 0
    var headerH = 0
    var seenAvih = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    // returns false on any structural violation -> whole decode fails
    def walk(start: Int, end: Int): Boolean = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val id = new String(p, off, 4, "US-ASCII")
        val len = u32(off + 4)
        if (len < 0 || off + 8 + len > end) ok = false
        else {
          if (id == "LIST") {
            if (len < 4) ok = false
            else ok = walk(off + 12, off + 8 + len.toInt)
          } else if (id == "avih") {
            // dwMicroSecPerFrame @0, dwWidth @32, dwHeight @36
            if (len < 40) ok = false
            else {
              microPerFrame = u32(off + 8)
              headerW = u32(off + 40).toInt
              headerH = u32(off + 44).toInt
              seenAvih = true
            }
          } else if (isFrameId(id)) {
            frames += ((off + 8, len.toInt))
          }
          off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
        }
      }
      ok
    }
    if (!walk(12, p.length) || !seenAvih || frames.isEmpty) return None
    var decoded = 0
    var w = headerW
    var h = headerH
    var lumSum = 0.0
    var idx = 0
    frames.foreach { case (fOff, fLen) =>
      if (idx % frameStride == 0) {
        val bytes = java.util.Arrays.copyOfRange(p, fOff, fOff + fLen)
        decodeImage(bytes).foreach { case (fw, fh, lum) =>
          if (decoded == 0) { w = fw; h = fh }
          decoded += 1
          lumSum += lum
        }
      }
      idx += 1
    }
    Some(AviFeatures(frames.size, decoded, w, h,
      microPerFrame * frames.size / 1000L,
      if (decoded == 0) 0.0 else lumSum / decoded))
  }

  /** Deterministic AVI plant — the video analog of [[syntheticPng]]:
    * a RIFF/AVI container (hdrl LIST with a 56-byte `avih`, movi LIST
    * with one `00dc` chunk per frame) whose frames are lossless
    * solid-gray PNGs, so the decoded per-frame brightness is exactly
    * `gray/255` and the mean over frames is closed-form in the
    * parameters.
    */
  def syntheticAvi(grays: Seq[Int], width: Int, height: Int,
      microPerFrame: Long): Array[Byte] = {
    require(grays.nonEmpty && microPerFrame > 0,
      s"syntheticAvi(${grays.length} frames, $microPerFrame us) out of range")
    val pngs = grays.map(g => syntheticPng(g, width, height))
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val buf = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      buf.array()
    }
    def list(subtype: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = bodies.flatten.toArray
      val buf = java.nio.ByteBuffer.allocate(12 + inner.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("LIST".getBytes("US-ASCII")).putInt(4 + inner.length)
        .put(subtype.getBytes("US-ASCII")).put(inner)
      buf.array()
    }
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(microPerFrame.toInt) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0)
      .putInt(grays.length) // dwTotalFrames
      .putInt(0).putInt(1).putInt(0) // streams = 1
      .putInt(width).putInt(height) // dwWidth @32, dwHeight @36
    val hdrl = list("hdrl", Seq(chunk("avih", avih.array())))
    val movi = list("movi", pngs.map(chunk("00dc", _)))
    val form = hdrl ++ movi
    val buf = java.nio.ByteBuffer.allocate(12 + form.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + form.length)
      .put("AVI ".getBytes("US-ASCII")).put(form)
    buf.array()
  }

  /** Partition-wise video feature extraction — same batch contract as
    * [[extractFeatures]]/[[extractAudioFeatures]], with the AVI walk +
    * per-frame ImageIO decode as the codec and zeroed features as the
    * no-decode fallback.
    */
  def extractVideoFeatures(media: DataFrame, frameStride: Int = 1): DataFrame = {
    val enc = RowEncoder.encoderFor(videoFeatureSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val nBytes = if (payload == null) 0L else payload.length.toLong
          decodeAvi(payload, frameStride) match {
            case Some(f) => Row(r.getAs[Long]("media_id"), nBytes, true,
              f.nFrames, f.decodedFrames, f.width, f.height,
              f.durationMs, f.meanBrightness)
            case None => Row(r.getAs[Long]("media_id"), nBytes, false,
              0, 0, 0, 0, 0L, 0.0)
          }
        }
      }(enc)
  }

  /** Frame sampling for video-kind media: explode into `n` evenly
    * spaced (frame_idx, offset_ms) rows — pure plumbing, no decode.
    */
  def frameSample(media: DataFrame, n: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("i", "frame_idx")))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * col("duration_ms") / n).cast("long").as("offset_ms"))
}
