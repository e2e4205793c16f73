package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic WARC-archive fixture for the q171 gate — the
  * crawl-tier analog of [[dsv2.ThetaCsvSource]]'s canned CSV
  * transport: the raw input (here: real `.warc` FILES on disk, the
  * tier upstream of every HTML string in CrawlQueries) is synthesized
  * from the documents rows so the DuckDB oracle can derive ground
  * truth from the same rows, and the engine exercises the REAL
  * operator — [[dsv2.WarcSource]]'s record-boundary chunk reads,
  * type pushdown and payload framing — against genuine archive bytes.
  *
  * Layout: 4 archive files keyed by `doc_id % 4`, records in doc_id
  * order within each — one `warcinfo` head record per file, then a
  * `request`/`response` pair per document (the request records are
  * the >50% non-response noise a real archive carries; the pushed
  * type filter prunes them at the reader). The response payload is
  * the full HTTP message whose body is the exact
  * `CrawlQueries.htmlFixture` page, so q162's extraction ground
  * truth carries over unchanged.
  *
  * The WRITE side runs as one `mapGroups` pass (4 bounded groups —
  * each task owns one archive file, written staged-then-rename the
  * [[GraftCsvSink]] way); it is GATE SCAFFOLDING: a production
  * pipeline reads archives its crawler already wrote, it does not
  * synthesize them.
  */
object WarcFixture {

  private val Gap = "\r\n\r\n"

  /** The HTTP response head of every fixture page — the reference
    * point for the oracle's `n_bytes` arithmetic (octet_length of
    * head + page).
    */
  val HttpHead = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"

  private def escaped(text: String): String =
    text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Byte-exact Scala mirror of `CrawlQueries.htmlFixture` (the
    * Column version q162 extracts from) — the two MUST stay in sync
    * or the oracle's clean-text/byte-count replay breaks, which is
    * exactly what the differential would catch.
    */
  private[graft] def htmlFor(docId: Long, text: String, source: String): String =
    s"<html><head><title>Doc $docId</title><style>p{margin:0}</style>" +
      "<script>var x=1;</script></head>" +
      "<body><!-- crawler:generated -->" +
      "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About</a></div>" +
      s"<p>${escaped(text)} see <a href=\"/ref\">reference</a> notes &amp; more &lt;raw&gt;</p>" +
      (if (docId % 3 == 0) s"<p>appendix for $source</p>" else "") +
      (if (docId % 2 == 0)
        "<div class=\"ads\"><a href=\"/buy\">Buy</a> <a href=\"/now\">Now</a></div>"
      else "") +
      "<div class=\"footer\"><a href=\"/terms\">Terms</a>" +
      " <a href=\"/privacy\">Privacy</a></div></body></html>"

  private def record(wtype: String, uri: Option[String],
      payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0\r\n")
    head ++= s"WARC-Type: $wtype\r\n"
    uri.foreach(u => head ++= s"WARC-Target-URI: $u\r\n")
    head ++= "WARC-Date: 2024-03-01T00:00:00Z\r\n"
    head ++= (if (wtype == "response")
      "Content-Type: application/http; msgtype=response\r\n"
    else "Content-Type: application/http; msgtype=request\r\n")
    head ++= s"Content-Length: ${payload.length}\r\n\r\n"
    // ISO 28500 §4: header fields are UTF-8 (all-ASCII here, but the
    // encoding choice must match the reader's contract)
    head.toString.getBytes(UTF_8) ++ payload
  }

  private[graft] def responseRecord(docId: Long, text: String,
      source: String): Array[Byte] =
    record("response", Some(s"https://$source.example.com/docs/$docId"),
      (HttpHead + htmlFor(docId, text, source)).getBytes(UTF_8))

  private def requestRecord(docId: Long, source: String): Array[Byte] =
    record("request", Some(s"https://$source.example.com/docs/$docId"),
      s"GET /docs/$docId HTTP/1.1\r\nHost: $source.example.com\r\n\r\n"
        .getBytes(US_ASCII))

  private def warcinfo(fileNo: Long): Array[Byte] =
    record("warcinfo", None,
      s"software: graft-crawler\r\nfile: crawl-$fileNo\r\n".getBytes(US_ASCII))

  /** Write (or rewrite — content is a pure function of the rows) the
    * archive for `docs` (`doc_id`, `text`, `source`) under a
    * directory keyed by the scale-factor name; returns that
    * directory. Null text pages render as the empty string — the
    * q164 null-as-empty convention.
    */
  def ensure(docs: DataFrame, sfDir: String): String = {
    val out = new File(
      s"/tmp/graft_warc/${new File(sfDir).getName}")
    out.mkdirs()
    val s = docs.sparkSession
    import s.implicits._
    val written = docs
      .select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).as("text"), col("source"))
      .as[(Long, String, String)]
      .groupByKey(_._1 % 4)
      .mapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._1)
        val bos = new java.io.ByteArrayOutputStream(1 << 20)
        bos.write(warcinfo(k))
        rows.foreach { case (id, text, source) =>
          bos.write(Gap.getBytes(US_ASCII))
          bos.write(requestRecord(id, source))
          bos.write(Gap.getBytes(US_ASCII))
          bos.write(responseRecord(id, text, source))
        }
        val tmp = File.createTempFile(s"crawl-$k", ".tmp", out)
        Files.write(tmp.toPath, bos.toByteArray)
        // atomic publish — a retried/speculated task replaces, never
        // interleaves (the two-phase-commit discipline of GraftCsvSink)
        Files.move(tmp.toPath, new File(out, s"crawl-$k.warc").toPath,
          StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        k
      }.count()
    require(written > 0, s"empty documents frame for WARC fixture at $sfDir")
    out.getAbsolutePath
  }
}
