package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source for the reference's CSV endpoint semantics
  * (SURVEY §2.1 S1 "optionally a DataSource V2 TableProvider for a
  * live HTTP source"), serving the dry-run fixture shape
  * (utils.py:617-638 `THETADATA_DRY_RUN` canned CSV) instead of a
  * network transport:
  *
  *  - one InputPartition PER TRADING DAY — the reference's
  *    per-business-day fan-out (S4, v3/utils.py:444-503) expressed as
  *    Spark input splits, so day-level parallelism is the scan's
  *    native shape;
  *  - date-range filter PUSHDOWN prunes whole day-partitions before
  *    any "fetch" (the reference ships date params to the server —
  *    here Catalyst ships them into `planInputPartitions`);
  *  - each partition materializes its day's CSV text and parses it
  *    line-by-line — the exact parse path of the reference
  *    (`_parse_csv_to_dataframe`, utils.py:562-580), minus the HTTP
  *    hop a live deployment would add in [[DayCsvReader.csvForDay]].
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.dsv2.ThetaCsvSource")
  *     .option("root", "AAPL").option("days", "5")
  *     .option("start", "2024-01-02").load()
  * }}}
  */
class ThetaCsvSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ThetaCsvSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ThetaCsvTable(properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object ThetaCsvSource {
  /** Canonical bar schema (§1.4 single-contract bars, trimmed). */
  val schema: StructType = StructType(Seq(
    StructField("day", DateType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("root", StringType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false)))

  val barsPerDay = 13 // hourly bars 09:30-16:00 at :30, half-open

  private val epoch = java.time.LocalDate.ofEpochDay(0)

  def dayNumber(isoDate: String): Int =
    java.time.temporal.ChronoUnit.DAYS
      .between(epoch, java.time.LocalDate.parse(isoDate)).toInt
}

final class ThetaCsvTable(props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = s"theta_csv(${props.getOrElse("root", "SPY")})"
  override def schema(): StructType = ThetaCsvSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ThetaCsvScanBuilder(
      options.getOrDefault("root", props.getOrElse("root", "SPY")),
      options.getOrDefault("start", props.getOrElse("start", "2024-01-02")),
      options.getOrDefault("days", props.getOrElse("days", "5")).toInt,
      Option(options.get("transport")).orElse(props.get("transport")))
}

final class ThetaCsvScanBuilder(root: String, start: String, nDays: Int,
    transport: Option[String])
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  /** Accept day-range predicates; everything else stays in Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("day", _: java.sql.Date) => true
      case GreaterThanOrEqual("day", _: java.sql.Date) => true
      case LessThan("day", _: java.sql.Date) => true
      case LessThanOrEqual("day", _: java.sql.Date) => true
      case EqualTo("day", _: java.sql.Date) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new ThetaCsvScan(root, start, nDays, pushed, transport)
}

final class ThetaCsvScan(root: String, start: String, nDays: Int,
    pushed: Array[Filter], transport: Option[String])
    extends Scan with Batch {

  override def readSchema(): StructType = ThetaCsvSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ThetaCsvScan(root=$root, days=$nDays, pushed=${pushed.mkString(",")})"

  private def dayAllowed(dayNum: Int): Boolean = pushed.forall {
    case GreaterThan("day", d: java.sql.Date) => dayNum > d.toLocalDate.toEpochDay
    case GreaterThanOrEqual("day", d: java.sql.Date) => dayNum >= d.toLocalDate.toEpochDay
    case LessThan("day", d: java.sql.Date) => dayNum < d.toLocalDate.toEpochDay
    case LessThanOrEqual("day", d: java.sql.Date) => dayNum <= d.toLocalDate.toEpochDay
    case EqualTo("day", d: java.sql.Date) => dayNum == d.toLocalDate.toEpochDay
    case _ => true
  }

  /** One split per surviving day — pruned BEFORE any fetch. The
    * transport NAME resolves here, on the driver, and the resolved
    * (Serializable) instance ships inside each partition: a name
    * resolved in the reader would hit the executor JVM's registry,
    * which is empty under any forked-executor master
    * (local-cluster / a real cluster).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val t = TransportRegistry.resolve(transport)
    val startDay = ThetaCsvSource.dayNumber(start)
    (0 until nDays).map(startDay + _).filter(dayAllowed)
      .map(d => DayPartition(root, d, t): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new DayCsvReader(partition.asInstanceOf[DayPartition])
}

final case class DayPartition(root: String, dayNum: Int,
    transport: DayTransport) extends InputPartition

/** Parses one day's CSV text into rows — the reference's
  * `_parse_csv_to_dataframe` path. The fetch goes through the typed
  * error taxonomy + exponential-backoff retry ([[ThetaStatus]] —
  * utils.py:599–658 / ThetaExceptions.py semantics): transient
  * failures (429/474/571) retry in-task up to 5 tries; every other
  * status raises its typed error with this split's (root, day), so a
  * failed task tells the operator whether a rerun can help.
  */
final class DayCsvReader(p: DayPartition) extends PartitionReader[InternalRow] {

  private def csvForDay: String = {
    val t = p.transport
    ThetaStatus.retryWithBackoff(maxTries = 5, baseDelayMs = 10) {
      val (code, body) = t.fetch(p.root, p.dayNum)
      ThetaStatus.raiseForStatus(code, s"root=${p.root} day=${p.dayNum}")
      body
    }
  }

  private val lines = csvForDay.split('\n').iterator
  private var header: Array[String] = null
  private var current: InternalRow = null

  override def next(): Boolean = {
    if (header == null && lines.hasNext) header = lines.next().split(',')
    if (!lines.hasNext) return false
    val f = lines.next().split(',')
    val minOfDay = f(0).toInt
    val dayMicros = p.dayNum.toLong * 86400L * 1000000L
    current = new GenericInternalRow(Array[Any](
      p.dayNum,
      dayMicros + minOfDay.toLong * 60L * 1000000L,
      UTF8String.fromString(p.root),
      f(1).toDouble, f(2).toDouble, f(3).toDouble, f(4).toDouble,
      f(5).toLong))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
