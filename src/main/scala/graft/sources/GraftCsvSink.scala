package graft.sources.dsv2

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap, UUID}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE side of the CSV-endpoint connector — the K1
  * append/replace sink expressed as a DSv2 `SupportsWrite` table, the
  * mirror of [[ThetaCsvSource]]'s read side (SURVEY §2.1 S1/K1):
  *
  *  - `BATCH_WRITE` + `TRUNCATE` capabilities → Spark's
  *    `mode("append")` plans AppendData and `mode("overwrite")` plans
  *    a truncating overwrite, the reference's append/replace store
  *    modes (Store.py `if_exists='append' | 'replace'`);
  *  - each task streams its partition to a STAGED file and returns the
  *    path as its commit message; the driver-side `commit` publishes
  *    all staged files atomically-enough for a local filesystem
  *    (rename into place), `abort` discards them — the standard
  *    two-phase DSv2 commit protocol. A cloud deployment would swap
  *    the rename for a committer/manifest write; the task-side
  *    protocol is identical.
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.dsv2.GraftCsvSink")
  *     .option("path", dir).mode("append").save()
  * }}}
  */
class GraftCsvSink extends TableProvider {

  // a sink has no intrinsic schema — it accepts the written DataFrame's
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftCsvSinkTable(
      properties.asScala.getOrElse("path",
        throw new IllegalArgumentException("GraftCsvSink requires a 'path' option")),
      schema)

  override def supportsExternalMetadata(): Boolean = true
}

final class GraftCsvSinkTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {

  override def name(): String = s"graft_csv_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftCsvWriteBuilder(path, info.schema(), truncate = false)
}

final class GraftCsvWriteBuilder(path: String, schema: StructType,
    truncate: Boolean) extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new GraftCsvWriteBuilder(path, schema, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftCsvBatchWrite(path, schema, truncate)
  }
}

final class GraftCsvBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  private val stagingDir = s"$path/.staging-${UUID.randomUUID()}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftCsvWriterFactory(stagingDir, schema)

  /** Publish: optionally clear prior part files (replace semantics),
    * then rename every staged file into the target directory.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    dir.mkdirs()
    if (truncate) {
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.startsWith("part-"))
        .foreach(_.delete())
    }
    messages.collect { case StagedFile(p) =>
      val src = Paths.get(p)
      Files.move(src, Paths.get(path, src.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    deleteStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteStaging()

  private def deleteStaging(): Unit = {
    val d = new File(stagingDir)
    Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    d.delete()
  }
}

final case class StagedFile(path: String) extends WriterCommitMessage

final class GraftCsvWriterFactory(stagingDir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCsvDataWriter(stagingDir, schema, partitionId, taskId)
}

/** Streams one partition to one staged CSV file (header + rows).
  * Rendering is type-directed off the write schema — dates as ISO
  * days, timestamps as `yyyy-MM-dd HH:mm:ss` (bar data is
  * second-aligned), numerics via toString.
  */
final class GraftCsvDataWriter(stagingDir: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  new File(stagingDir).mkdirs()
  private val file = new File(stagingDir, f"part-$partitionId%05d-$taskId.csv")
  private val out = Files.newBufferedWriter(file.toPath, StandardCharsets.UTF_8)
  out.write(schema.fieldNames.mkString(","))
  out.newLine()

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")

  private def render(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) ""
    else dt match {
      case DateType => java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
      case TimestampType =>
        val us = row.getLong(i)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).format(tsFmt)
      case StringType => row.getUTF8String(i).toString
      case IntegerType => row.getInt(i).toString
      case LongType => row.getLong(i).toString
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case BooleanType => row.getBoolean(i).toString
      case other => row.get(i, other).toString
    }

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.indices
      .map(i => render(row, i, schema.fields(i).dataType)).mkString(",")
    out.write(line)
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(file.getAbsolutePath)
  }

  override def abort(): Unit = {
    out.close()
    file.delete()
  }

  override def close(): Unit = ()
}
