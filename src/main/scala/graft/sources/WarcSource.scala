package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source for WARC crawl archives (ISO 28500 — the
  * record-delimited file format Common-Crawl-class pipelines ingest):
  * the tier UPSTREAM of the q162 HTML-extraction family, which until
  * r20 started from HTML strings already sitting in a parquet column.
  * Same DSv2 discipline as [[ThetaCsvSource]] one tier earlier:
  *
  *  - input splits are BYTE RANGES of each archive file
  *    (`chunkBytes`, default 4 MiB) with record-boundary seeking —
  *    the HDFS text-split rule: a reader that does not start at a
  *    record boundary scans forward to the first
  *    `\r\n\r\nWARC/1.0\r\n` marker, and every reader consumes
  *    exactly the records whose START offset lies inside its range
  *    (payloads may extend past it), so splits partition the record
  *    stream without coordination at any archive size;
  *  - `warc_type` equality pushdown prunes records AT THE READER —
  *    a sequential format cannot skip bytes, but non-matching records
  *    (request/metadata/warcinfo noise, routinely >50% of archive
  *    records) skip payload materialization and row emission;
  *  - malformed content is a data condition, not a crash: a TRUNCATED
  *    final record (the normal end state of a live-rotated archive)
  *    is dropped, and garbage between records re-syncs by scanning
  *    forward to the next record marker (WarcSourceSpec pins both).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.dsv2.WarcSource")
  *     .option("path", "/archives/crawl-2024-01")
  *     .option("chunkBytes", "4194304").load()
  * }}}
  */
class WarcSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WarcTable(properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object WarcSource {
  /** One row per WARC record: header fields parsed, payload opaque
    * bytes (for response records: the full HTTP message — status
    * line, headers, body; strip at `position(payload, CRLF CRLF)`).
    */
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("warc_date", TimestampType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  private[dsv2] val Marker = "WARC/1.0\r\n".getBytes("US-ASCII")
  private[dsv2] val Gap = "\r\n\r\n".getBytes("US-ASCII")

  /** KMP failure table — the gap+marker pattern self-overlaps (an
    * extra blank line puts `\r\n` prefixes back-to-back), so a naive
    * reset-to-zero matcher can run PAST a marker it half-consumed and
    * never re-sync. 14 bytes of table buys linear-time certainty.
    */
  private[dsv2] def kmpTable(pat: Array[Byte]): Array[Int] = {
    val f = new Array[Int](pat.length)
    var k = 0
    var i = 1
    while (i < pat.length) {
      while (k > 0 && pat(i) != pat(k)) k = f(k - 1)
      if (pat(i) == pat(k)) k += 1
      f(i) = k
      i += 1
    }
    f
  }
  private[dsv2] val GapMarker = Gap ++ Marker
  private[dsv2] val GapMarkerF = kmpTable(GapMarker)

  /** Largest payload the reader will carry as one row (1 GiB). A
    * Content-Length outside [0, cap] is treated as header corruption
    * — re-sync, never allocate from untrusted framing.
    */
  private[dsv2] val MaxPayloadBytes: Long = 1L << 30
}

final class WarcTable(props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = s"warc(${props.getOrElse("path", "?")})"
  override def schema(): StructType = WarcSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(
      options.getOrDefault("path", props.getOrElse("path",
        throw new IllegalArgumentException("WarcSource requires option 'path'"))),
      options.getOrDefault("chunkBytes",
        props.getOrElse("chunkBytes", (4L * 1024 * 1024).toString)).toLong)
}

final class WarcScanBuilder(path: String, chunkBytes: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = WarcSource.schema

  /** Accept `warc_type = '…'`; everything else stays in Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("warc_type", _: String) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Column pruning — a sequential format still scans every byte of
    * HEADER, but a projection without `payload` never MATERIALIZES
    * record bodies (they are `skip`ped by Content-Length), which is
    * most of the archive's bytes held in memory.
    */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new WarcScan(path, chunkBytes, pushed, required)
}

final class WarcScan(path: String, chunkBytes: Long, pushed: Array[Filter],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan(path=$path, chunk=$chunkBytes, pushed=${pushed.mkString(",")}, " +
      s"cols=${required.fieldNames.mkString(",")})"

  private def typeAllowed: Option[String] = pushed.collectFirst {
    case EqualTo("warc_type", t: String) => t
  }

  /** Byte-range splits per archive file. Driver lists the directory
    * once (on a DFS this is the NameNode listing); ranges never read
    * bytes here.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".warc"))
      .sortBy(_.getName)
    require(files.nonEmpty, s"no .warc files under $path")
    files.flatMap { f =>
      val len = f.length()
      val n = math.max(1L, (len + chunkBytes - 1) / chunkBytes)
      (0L until n).map { i =>
        WarcChunk(f.getPath, i * chunkBytes,
          math.min((i + 1) * chunkBytes, len), typeAllowed,
          required.fieldNames): InputPartition
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new WarcChunkReader(partition.asInstanceOf[WarcChunk])
}

final case class WarcChunk(file: String, start: Long, end: Long,
    typeAllowed: Option[String], columns: Array[String]) extends InputPartition

/** Reads the WARC records whose start offset lies in `[start, end)`.
  * Forward-only buffered stream; no whole-file materialization — the
  * reader holds one record's header + payload at a time.
  */
final class WarcChunkReader(p: WarcChunk) extends PartitionReader[InternalRow] {

  private val in = new java.io.BufferedInputStream(
    new java.io.FileInputStream(p.file), 64 * 1024)
  // FileInputStream.skip lseeks PAST EOF without complaint, so the
  // skip path cannot detect a truncated record from skip's return
  // value — the file length is the truncation oracle instead
  private val fileLen = new java.io.File(p.file).length()
  private var pos: Long = 0L
  private var current: InternalRow = null
  private var done = false

  // position the stream at the first record START inside the range:
  // offset 0 is a record start by construction; any other start is
  // preceded by the inter-record gap, so scan for GAP+MARKER from
  // start-4 (a record starting exactly AT `start` is still found)
  locally {
    if (p.start == 0L) ()
    else {
      skipTo(math.max(p.start - WarcSource.Gap.length, 0L))
      if (!seekMarker()) done = true
    }
  }

  private def skipTo(target: Long): Unit = {
    while (pos < target) {
      val skipped = in.skip(target - pos)
      if (skipped <= 0) { done = true; return }
      pos += skipped
    }
  }

  private def read1(): Int = {
    val b = in.read()
    if (b >= 0) pos += 1
    b
  }

  /** Scan forward for (gap +) marker via KMP; afterwards the stream
    * sits just past "WARC/1.0\r\n" and `recStart` is the marker's
    * offset. False when EOF or the found record starts at/after
    * `end`. KMP, not reset-to-zero: the pattern's `\r\n` prefixes
    * self-overlap, and a naive matcher that half-consumes an extra
    * blank line runs past a real marker and never recovers.
    */
  private var recStart = 0L
  private def seekMarker(): Boolean = {
    val pat = WarcSource.GapMarker
    val fail = WarcSource.GapMarkerF
    var matched = 0
    while (matched < pat.length) {
      val b = read1()
      if (b < 0) return false
      while (matched > 0 && b.toByte != pat(matched)) matched = fail(matched - 1)
      if (b.toByte == pat(matched)) matched += 1
    }
    recStart = pos - WarcSource.Marker.length
    recStart < p.end
  }

  /** Header lines up to the blank line; None on EOF (truncation).
    * Bytes decode as UTF-8 (ISO 28500 §4: WARC named fields are
    * UTF-8) — byte-to-char widening would mangle any non-ASCII
    * WARC-Target-URI into Latin-1 mojibake.
    */
  private def readHeader(): Option[Map[String, String]] = {
    val buf = new java.io.ByteArrayOutputStream(256)
    var run = 0 // consecutive \r\n count
    while (run < 2) {
      val b = read1()
      if (b < 0) return None
      buf.write(b)
      if (b == '\n') run += 1 else if (b != '\r') run = 0
    }
    Some(new String(buf.toByteArray,
      java.nio.charset.StandardCharsets.UTF_8).linesIterator
      .filter(_.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
      }.toMap)
  }

  override def next(): Boolean = {
    while (!done) {
      // at this point the stream sits just past a record MARKER whose
      // start was < end (seeded by the constructor / previous record)
      if (pos == 0L) {
        // chunk starts at file head: consume the leading marker
        val head = new Array[Byte](WarcSource.Marker.length)
        var r = 0
        while (r < head.length) {
          val n = in.read(head, r, head.length - r)
          if (n < 0) { done = true; return false }
          r += n
        }
        pos += head.length
        recStart = 0L
        if (!java.util.Arrays.equals(head, WarcSource.Marker)) {
          // not actually a WARC head — re-sync to the next marker
          if (!seekMarker()) { done = true; return false }
        }
      }
      readHeader() match {
        case None => done = true // truncated header: drop, normal EOF state
        case Some(h) =>
          h.get("content-length").flatMap(_.toLongOption)
            .filter(l => l >= 0 && l <= WarcSource.MaxPayloadBytes) match {
            case None =>
              // malformed record: re-sync to the next marker
              if (!seekMarker()) done = true
            case Some(len) =>
              val wtype = h.getOrElse("warc-type", "unknown")
              val wanted = p.typeAllowed.forall(_ == wtype)
              // bytes materialize ONLY when the record passes the
              // pushed type filter AND the projection kept `payload`;
              // otherwise the body is skipped by Content-Length
              val materialize = wanted && p.columns.contains("payload")
              val payload =
                if (materialize) {
                  val buf = new Array[Byte](len.toInt)
                  var r = 0
                  var eof = false
                  while (r < len && !eof) {
                    val n = in.read(buf, r, (len - r).toInt)
                    if (n < 0) eof = true else { r += n; pos += n }
                  }
                  if (eof) null else buf // truncated payload: drop record
                } else if (pos + len > fileLen) null // truncated: drop
                else { skipTo(pos + len); if (done) null else Array.empty[Byte] }
              if (payload == null) done = true
              else {
                // consume the inter-record gap + next marker; done when
                // EOF or the next record starts at/after `end`
                val more = seekMarker()
                if (wanted) {
                  current = WarcChunkReader.row(h, payload, len, p.columns)
                  if (!more) done = true
                  return true
                }
                if (!more) done = true
              }
          }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

object WarcChunkReader {
  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** Projected row in `columns` order (the pruned read schema).
    * `len` is the header-declared Content-Length — `n_bytes` stays
    * correct even when the payload bytes themselves were skipped.
    */
  private[dsv2] def row(h: Map[String, String], payload: Array[Byte],
      len: Long, columns: Array[String]): InternalRow = {
    def field(name: String): Any = name match {
      case "url" => h.get("warc-target-uri").map(utf8).orNull
      case "warc_type" => utf8(h.getOrElse("warc-type", "unknown"))
      case "content_type" => h.get("content-type").map(utf8).orNull
      case "warc_date" =>
        h.get("warc-date").flatMap { d =>
          try Some(java.time.Instant.parse(d))
          catch { case _: java.time.format.DateTimeParseException => None }
        }.map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)
          .map(java.lang.Long.valueOf).orNull
      case "n_bytes" => len
      case "payload" => payload
      case other =>
        throw new IllegalArgumentException(s"unknown WARC column '$other'")
    }
    new GenericInternalRow(columns.map(field))
  }
}
