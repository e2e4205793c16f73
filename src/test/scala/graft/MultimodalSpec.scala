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

  test("synthetic WAV decodes to closed-form features") {
    // odd frame count → non-zero mean; stereo duplicates channels
    val f = MultimodalOps.decodeWav(
      MultimodalOps.syntheticWav(1200, 101, 16000, 2)).get
    assert(f.sampleRate == 16000 && f.nChannels == 2 && f.nFrames == 101L)
    assert(f.durationMs == 101L * 1000 / 16000)
    assert(f.rms == 1200.0 / 32768.0)
    assert(f.peak == 1200.0 / 32768.0)
    assert(f.mean == (2.0 * 1200) / (2 * 101) / 32768.0)
    // even frame count → the ±amp wave cancels exactly
    val even = MultimodalOps.decodeWav(
      MultimodalOps.syntheticWav(900, 64, 8000, 1)).get
    assert(even.mean == 0.0 && even.rms == 900.0 / 32768.0)
  }

  test("corrupt or non-PCM WAV payloads fall back, never throw") {
    val good = MultimodalOps.syntheticWav(500, 40, 8000, 1)
    val truncated = good.take(50) // data chunk cut mid-way
    val nonPcm = good.clone(); nonPcm(20) = 3 // format code != 1 (float)
    val oddLen = good.clone(); {
      // shrink declared data length to a non-multiple of blockAlign
      val b = java.nio.ByteBuffer.wrap(oddLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40, 39)
    }
    assert(MultimodalOps.decodeWav(truncated).isEmpty)
    assert(MultimodalOps.decodeWav(nonPcm).isEmpty)
    assert(MultimodalOps.decodeWav(oddLen).isEmpty)
    assert(MultimodalOps.decodeWav("not audio at all".getBytes("UTF-8")).isEmpty)
    // and through the batch stage: corrupt rows emit the zeroed
    // fallback with decoded=false instead of failing the task
    import spark.implicits._
    val media = Seq((1L, good), (2L, truncated)).toDF("media_id", "payload")
    val out = MultimodalOps.extractAudioFeatures(media)
      .orderBy("media_id").collect()
    assert(out(0).getAs[Boolean]("decoded") &&
      out(0).getAs[Double]("rms") == 500.0 / 32768.0)
    assert(!out(1).getAs[Boolean]("decoded") &&
      out(1).getAs[Long]("n_bytes") == 50L &&
      out(1).getAs[Double]("rms") == 0.0)
  }

  test("synthetic AVI decodes to closed-form per-frame features") {
    val f = MultimodalOps.decodeAvi(
      MultimodalOps.syntheticAvi(Seq(60, 200, 10), 12, 9, 40000L)).get
    assert(f.nFrames == 3 && f.decodedFrames == 3)
    assert(f.width == 12 && f.height == 9)
    assert(f.durationMs == 40000L * 3 / 1000) // 120 ms
    assert(f.meanBrightness ==
      (60.0 / 255.0 + 200.0 / 255.0 + 10.0 / 255.0) / 3)
  }

  test("frame stride decodes every k-th frame; container count stays total") {
    val avi = MultimodalOps.syntheticAvi(Seq(10, 250, 40, 200, 90), 8, 8, 20000L)
    val s2 = MultimodalOps.decodeAvi(avi, frameStride = 2).get
    assert(s2.nFrames == 5 && s2.decodedFrames == 3) // frames 0, 2, 4
    assert(s2.meanBrightness ==
      (10.0 / 255.0 + 40.0 / 255.0 + 90.0 / 255.0) / 3)
    // stride beyond the frame count → first frame only
    val s9 = MultimodalOps.decodeAvi(avi, frameStride = 9).get
    assert(s9.decodedFrames == 1 && s9.meanBrightness == 10.0 / 255.0)
    // duration always covers ALL frames — sampling changes decode
    // cost, not the container's temporal extent
    assert(s2.durationMs == 20000L * 5 / 1000 && s9.durationMs == s2.durationMs)
  }

  test("corrupt AVI containers fall back, never throw") {
    val good = MultimodalOps.syntheticAvi(Seq(100, 150), 8, 8, 33333L)
    val truncated = good.take(good.length / 2) // movi LIST cut mid-frame
    val noAvih = {
      // flip the avih fourcc so no header chunk is ever found
      val b = good.clone()
      val i = b.indexOfSlice("avih".getBytes("US-ASCII"))
      b(i) = 'x'.toByte; b
    }
    assert(MultimodalOps.decodeAvi(truncated).isEmpty)
    assert(MultimodalOps.decodeAvi(noAvih).isEmpty)
    assert(MultimodalOps.decodeAvi("not video at all".getBytes("UTF-8")).isEmpty)
    // frames that exist but hold junk image bytes: container decodes,
    // zero frames decode, brightness falls back to 0
    val junkFrames = {
      val png = MultimodalOps.syntheticPng(100, 8, 8)
      val b = MultimodalOps.syntheticAvi(Seq(100), 8, 8, 33333L)
      val i = b.indexOfSlice(png.take(8))
      b(i) = 'j'.toByte; b // break the PNG magic inside the 00dc chunk
    }
    val jf = MultimodalOps.decodeAvi(junkFrames).get
    assert(jf.nFrames == 1 && jf.decodedFrames == 0 && jf.meanBrightness == 0.0)
    // and through the batch stage
    import spark.implicits._
    val media = Seq((1L, good), (2L, truncated)).toDF("media_id", "payload")
    val out = MultimodalOps.extractVideoFeatures(media)
      .orderBy("media_id").collect()
    assert(out(0).getAs[Boolean]("decoded") &&
      out(0).getAs[Int]("n_frames") == 2 &&
      out(0).getAs[Double]("mean_brightness") ==
        (100.0 / 255.0 + 150.0 / 255.0) / 2)
    assert(!out(1).getAs[Boolean]("decoded") &&
      out(1).getAs[Int]("n_frames") == 0)
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

  test("aHash of a pattern PNG reproduces its bit pattern exactly") {
    for (bits <- Seq(0L, 1L, 0x5555555555555555L & ~(1L << 63),
        0x123456789abcdefL, (1L << 62) | 7L)) {
      val p = MultimodalOps.syntheticPatternPng(bits)
      assert(MultimodalOps.imageAHash(p).contains(bits),
        s"aHash mismatch for bits=$bits")
    }
  }

  test("aHash mean-pools larger rasters; Hamming tracks planted flips") {
    // 16x16 image, each 2x2 block uniform -> pooling must reproduce
    // the same 8x8 pattern as the direct plant
    val bits = 0xdeadbeefcafeL
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val i = (y / 2) * 8 + (x / 2)
      img.setRGB(x, y, if (((bits >> i) & 1L) == 1L) 0xffffff else 0)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(MultimodalOps.imageAHash(bos.toByteArray).contains(bits))
    // two flipped bits -> Hamming 2
    val flipped = bits ^ (1L << 5) ^ (1L << 20)
    val h1 = MultimodalOps.imageAHash(MultimodalOps.syntheticPatternPng(bits)).get
    val h2 = MultimodalOps.imageAHash(MultimodalOps.syntheticPatternPng(flipped)).get
    assert(java.lang.Long.bitCount(h1 ^ h2) == 2)
  }

  test("aHash rejects non-image payloads and tiny rasters") {
    assert(MultimodalOps.imageAHash("not an image".getBytes("UTF-8")).isEmpty)
    assert(MultimodalOps.imageAHash(Array.empty[Byte]).isEmpty)
    assert(MultimodalOps.imageAHash(null).isEmpty)
    // a 4x4 image cannot fill the 8x8 grid — rejected, not garbage
    assert(MultimodalOps.imageAHash(MultimodalOps.syntheticPng(100, 4, 4)).isEmpty)
    // truncated PNG: magic bytes pass the sniff, decode must fail soft
    val png = MultimodalOps.syntheticPatternPng(42L)
    assert(MultimodalOps.imageAHash(png.take(20)).isEmpty)
  }
}
