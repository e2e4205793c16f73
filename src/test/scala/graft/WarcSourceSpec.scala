package graft

import java.io.File
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 WARC-archive connector ([[graft.sources.dsv2.WarcSource]]):
  * record parse, byte-range chunk splits with record-boundary seeking,
  * `warc_type` pushdown, column pruning, and the malformed-content
  * contract (truncated final record drops, garbage between records
  * re-syncs — including the self-overlapping blank-line case a naive
  * marker matcher misses).
  */
class WarcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Gap = "\r\n\r\n".getBytes(US_ASCII)

  private def rec(wtype: String, uri: Option[String], payload: Array[Byte],
      contentLength: Option[Long] = None,
      date: String = "2024-03-01T12:34:56Z"): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0\r\n")
    h ++= s"WARC-Type: $wtype\r\n"
    uri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= s"WARC-Date: $date\r\n"
    h ++= "Content-Type: application/http\r\n"
    contentLength.orElse(Some(payload.length.toLong))
      .foreach(n => h ++= s"Content-Length: $n\r\n")
    h ++= "\r\n"
    h.toString.getBytes(UTF_8) ++ payload // ISO 28500: headers are UTF-8
  }

  /** A record with NO Content-Length header at all (malformed). */
  private def noLenRec(uri: String): Array[Byte] = {
    val h = "WARC/1.0\r\n" + s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n\r\n"
    h.getBytes(US_ASCII) ++ "orphan body".getBytes(US_ASCII)
  }

  private def archive(recs: Seq[Array[Byte]]): Array[Byte] =
    recs.reduce((a, b) => a ++ Gap ++ b)

  private def writeDir(bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory("graft_warc_spec").toFile
    Files.write(new File(dir, "a.warc").toPath, bytes)
    dir.getAbsolutePath
  }

  private def read(path: String, chunkBytes: Long = 1 << 20) = spark.read
    .format("graft.sources.dsv2.WarcSource")
    .option("path", path).option("chunkBytes", chunkBytes.toString).load()

  private def threeRecords = Seq(
    rec("warcinfo", None, "software: test\r\n".getBytes(US_ASCII)),
    rec("request", Some("https://a.example.com/x"),
      "GET /x HTTP/1.1\r\n\r\n".getBytes(US_ASCII)),
    rec("response", Some("https://a.example.com/x"),
      "HTTP/1.1 200 OK\r\n\r\n<html>café</html>".getBytes(UTF_8)))

  test("parses records: header fields land in typed columns, payload byte-exact") {
    val df = read(writeDir(archive(threeRecords)))
    assert(df.schema.fieldNames.toSeq ==
      Seq("url", "warc_type", "content_type", "warc_date", "n_bytes", "payload"))
    assert(df.count() == 3)
    val resp = df.filter($"warc_type" === "response").head()
    assert(resp.getAs[String]("url") == "https://a.example.com/x")
    assert(resp.getAs[String]("content_type") == "application/http")
    assert(resp.getAs[java.sql.Timestamp]("warc_date").toInstant ==
      java.time.Instant.parse("2024-03-01T12:34:56Z"))
    val body = "HTTP/1.1 200 OK\r\n\r\n<html>café</html>".getBytes(UTF_8)
    assert(resp.getAs[Long]("n_bytes") == body.length.toLong)
    assert(resp.getAs[Array[Byte]]("payload").toSeq == body.toSeq)
    // the warcinfo record has no target URI: null column, not a crash
    assert(df.filter($"warc_type" === "warcinfo").head().isNullAt(0))
  }

  test("warc_type equality pushes to the reader and shows in the plan") {
    val df = read(writeDir(archive(threeRecords)))
      .filter($"warc_type" === "response")
    assert(df.count() == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WarcScan"), plan.take(400))
    assert(plan.contains("EqualTo(warc_type,response)"), plan.take(400))
  }

  test("column pruning reaches the scan (payload never materialized)") {
    val df = read(writeDir(archive(threeRecords))).select($"url", $"n_bytes")
    assert(df.count() == 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=url,n_bytes"), plan.take(400))
    // n_bytes comes from Content-Length, so it survives the payload skip
    assert(df.filter($"url".isNotNull).agg(sum($"n_bytes")).head().getLong(0) > 0)
  }

  test("truncated final record is dropped, not a crash") {
    val whole = archive(threeRecords)
    for (cut <- Seq(10, 40)) { // mid-header and mid-payload of record 1
      val dir = writeDir(whole.dropRight(cut))
      assert(read(dir).count() == 2, s"cut=$cut")
    }
  }

  test("garbage between records re-syncs — including extra blank lines") {
    val Seq(info, req, resp) = threeRecords
    // (a) plain garbage between two records
    val a = info ++ Gap ++ "!! corrupted bytes !!".getBytes(US_ASCII) ++
      Gap ++ resp
    assert(read(writeDir(a)).count() == 2)
    // (b) an EXTRA blank line before a record: gap+\r\n+marker
    // self-overlaps; a reset-to-zero matcher misses the marker
    val b = info ++ Gap ++ "\r\n".getBytes(US_ASCII) ++ req ++ Gap ++ resp
    assert(read(writeDir(b)).count() == 3)
    // (c) a record missing Content-Length re-syncs to the next record
    val c = info ++ Gap ++ noLenRec("https://bad.example.com/") ++
      Gap ++ resp
    val got = read(writeDir(c))
    assert(got.count() == 2)
    assert(got.filter($"url" === "https://bad.example.com/").count() == 0)
  }

  test("header fields decode as UTF-8 (non-ASCII target URIs survive)") {
    val uri = "https://h.example.com/café/straße"
    val a = archive(Seq(
      rec("response", Some(uri), "x".getBytes(US_ASCII))))
    val got = read(writeDir(a)).head()
    assert(got.getAs[String]("url") == uri)
  }

  test("negative or absurd Content-Length is header corruption: re-sync, no crash") {
    val Seq(info, _, resp) = threeRecords
    def badLen(len: String): Array[Byte] = {
      val h = "WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://bad.example.com/\r\n" +
        s"Content-Length: $len\r\n\r\n"
      h.getBytes(US_ASCII) ++ "stub".getBytes(US_ASCII)
    }
    for (len <- Seq("-1", (Long.MaxValue / 2).toString)) {
      val dir = writeDir(info ++ Gap ++ badLen(len) ++ Gap ++ resp)
      val got = read(dir)
      assert(got.count() == 2, s"len=$len")
      assert(got.filter($"url" === "https://bad.example.com/").count() == 0,
        s"len=$len")
    }
  }

  test("chunk splits partition the record stream exactly (no loss, no dupes)") {
    val recs = (0 until 40).map { i =>
      rec("response", Some(s"https://h.example.com/p/$i"),
        (s"HTTP/1.1 200 OK\r\n\r\n<html>" + ("x" * (20 + i * 7)) + "</html>")
          .getBytes(US_ASCII))
    }
    val dir = writeDir(archive(recs))
    for (chunk <- Seq(64L, 300L, 1 << 20)) { // smaller than a record → a chunk can be payload-interior
      val df = read(dir, chunk)
      assert(df.count() == 40, s"chunk=$chunk")
      assert(df.select($"url").distinct().count() == 40, s"chunk=$chunk")
    }
  }

  test("a record starting exactly at a chunk boundary belongs to the later chunk") {
    val Seq(info, req, resp) = threeRecords
    val bytes = archive(Seq(info, req, resp))
    // record 2 (req) starts at |info| + |gap|
    val boundary = info.length + Gap.length
    val df = read(writeDir(bytes), boundary.toLong)
    assert(df.rdd.getNumPartitions >= 2)
    assert(df.count() == 3)
    assert(df.select($"warc_type").as[String].collect().sorted.toSeq ==
      Seq("request", "response", "warcinfo"))
  }

  test("fixture round-trip: WarcFixture archives read back one response per doc") {
    val docs = Seq(
      (0L, "alpha beta", "web"),
      (1L, (null: String), "wiki"),
      (2L, "x <b>&</b> y", "web"),
      (3L, "straße café", "books"))
      .toDF("doc_id", "text", "source")
    val dir = graft.sources.WarcFixture.ensure(docs,
      Files.createTempDirectory("graft_warc_fix").toString)
    val resp = read(dir).filter($"warc_type" === "response")
    assert(resp.count() == 4)
    // byte count = UTF-8 octets of HTTP head + page (the oracle's rule)
    val r3 = resp.filter($"url".endsWith("/docs/3")).head()
    val expected = (graft.sources.WarcFixture.HttpHead +
      graft.sources.WarcFixture.htmlFor(3L, "straße café", "books"))
      .getBytes(UTF_8)
    assert(r3.getAs[Long]("n_bytes") == expected.length.toLong)
    assert(r3.getAs[Array[Byte]]("payload").toSeq == expected.toSeq)
    // request noise exists and is prunable
    assert(read(dir).count() == 4 * 2 + 4) // 4 files: warcinfo + req/resp per doc
  }
}
