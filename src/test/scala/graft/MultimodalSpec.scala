package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world"), (1L, "abc"), (2L, "Z"), (3L, "")
  ).toDF("doc_id", "text")

  test("packMedia produces the binary+meta contract") {
    val m = MultimodalOps.packMedia(docs, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.filter($"media_id" === 0L).head()
    val meta = row.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Long]("n_bytes") == 11L)
    assert(row.getAs[String]("kind") == "image")
    assert(m.filter($"media_id" === 2L).head().getAs[String]("kind") == "video")
  }

  test("extractFeatures runs partition-wise and is deterministic") {
    val m = MultimodalOps.packMedia(docs, "doc_id", "text").repartition(3)
    val f1 = MultimodalOps.extractFeatures(m).orderBy("media_id").collect()
    val f2 = MultimodalOps.extractFeatures(m).orderBy("media_id").collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.map(_.getAs[String]("kind")).toSeq ==
      Seq("image", "audio", "video", "image"))
    // checksum of "abc" = 97+98+99
    assert(f1(1).getAs[Long]("checksum") == 294L)
    assert(f1(3).getAs[Long]("n_bytes") == 0L)
    assert(f1.forall(r => {
      val b = r.getAs[Double]("brightness"); b >= 0.0 && b <= 1.0
    }))
  }

  test("feature schema matches the declared contract") {
    val f = MultimodalOps.extractFeatures(
      MultimodalOps.packMedia(docs, "doc_id", "text"))
    assert(f.schema == MultimodalOps.featureSchema)
  }

  test("frameSample explodes video media into offset rows") {
    val m = MultimodalOps.packMedia(docs, "doc_id", "text")
    val frames = MultimodalOps.frameSample(m, 4).orderBy("media_id", "frame_idx")
    val rows = frames.collect()
    assert(rows.forall(_.getAs[Long]("offset_ms") >= 0))
    assert(frames.groupBy("media_id").count().collect().forall(_.getLong(1) == 4))
  }

  test("planted PNG decodes to real width/height/brightness") {
    val png = MultimodalOps.syntheticPng(gray = 120, width = 17, height = 9)
    // a real PNG signature, produced by ImageIO itself
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val media = Seq((5L, "image", png))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(
        length($"payload").cast("long").as("n_bytes"), lit(17).as("width"),
        lit(9).as("height"), lit(0L).as("duration_ms")))
    val f = MultimodalOps.extractFeatures(media).head()
    assert(f.getAs[Boolean]("decoded"))
    assert(f.getAs[Int]("width") == 17 && f.getAs[Int]("height") == 9)
    // solid gray 120: mean luminance exactly 120/255 (PNG is lossless)
    assert(f.getAs[Double]("brightness") == 120.0 / 255.0)
  }

  test("corrupt image payload falls back to the stub, never throws") {
    val png = MultimodalOps.syntheticPng(gray = 10, width = 12, height = 12)
    val corrupt = png.take(20) // valid magic, truncated body
    val media = Seq(
      (1L, "image", corrupt),
      (2L, "image", "not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(
        length($"payload").cast("long").as("n_bytes"), lit(0).as("width"),
        lit(0).as("height"), lit(0L).as("duration_ms")))
    val f = MultimodalOps.extractFeatures(media).orderBy("media_id").collect()
    assert(f.forall(r => !r.getAs[Boolean]("decoded")))
    assert(f.forall(r => r.getAs[Int]("width") == 0 && r.getAs[Int]("height") == 0))
    // stub features still produced from the raw bytes
    assert(f(0).getAs[Long]("checksum") == corrupt.map(_ & 0xff).sum.toLong)
    assert(f.forall(r => {
      val b = r.getAs[Double]("brightness"); b >= 0.0 && b <= 1.0
    }))
  }

  test("media round-trips through parquet (binary + nested meta)") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    val m = MultimodalOps.packMedia(docs, "doc_id", "text")
    m.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet reads everything nullable; compare names + types
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.sql)).toSeq
    assert(shape(back.schema) == shape(m.schema))
    assert(back.count() == 4)
    val f = MultimodalOps.extractFeatures(back).orderBy("media_id").collect()
    assert(f(1).getAs[Long]("checksum") == 294L)
  }
}
