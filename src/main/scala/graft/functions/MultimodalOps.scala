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
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake features from
  * the raw bytes. Everything around it — the media schema, the
  * mapPartitions batch shape, partitioning, the feature output
  * contract — is real and tested, so swapping in a real codec is a
  * one-function change.
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

  /** Feature-extraction output contract. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("brightness", DoubleType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

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

  /** ??? in spirit — the codec boundary. Deterministic fake "decode":
    * byte-sum checksum and a brightness proxy. A real build links an
    * image/audio codec here; signature and batch shape stay identical.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Double) = {
    if (payload == null) return (0L, 0.0)
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
    (sum, if (payload.length == 0) 0.0 else sum.toDouble / payload.length / 255.0)
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
          val (checksum, brightness) = decodeStub(payload)
          val frames = (r.getAs[Long]("duration_ms") / 1000L).toInt + 1
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            if (payload == null) 0L else payload.length.toLong,
            checksum, brightness, frames)
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
