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
