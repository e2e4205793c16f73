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
