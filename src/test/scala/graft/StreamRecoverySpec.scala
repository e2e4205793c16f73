package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Checkpoint-recovery contracts the MemoryStream specs cannot cover:
  * a streaming query STOPPED and RESTARTED from its checkpoint must
  * (a) recover dedup state — a pre-watermark duplicate arriving after
  * the restart is still dropped, which is only possible if the state
  * store survived — and (b) stay exactly-once into the file sink (the
  * `_spark_metadata` commit log): no emitted row is duplicated or
  * lost across the restart. This is the production crash/deploy path
  * of T3/T4 (reference scheduling.py's restartable poll loop); here
  * the source is the file source (replayable from its offset log,
  * unlike MemoryStream) so the restart is honest.
  */
class StreamRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("contract", StringType),
    StructField("value", DoubleType), StructField("seq", LongType)))

  /** Write one json file of ticks into the source dir (one file per
    * call — each becomes a new file-source micro-batch input).
    */
  private def addFile(dir: Path, name: String, rows: Seq[Tick]): Unit = {
    val tmp = Files.createTempDirectory("stage")
    rows.toDF().coalesce(1).write.mode("overwrite").json(tmp.toString)
    val listing = Files.list(tmp) // stream holds a directory handle — close it
    val part = try listing.toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".json")).get
    finally listing.close()
    Files.move(part, dir.resolve(name))
  }

  private def runUntilDrained(df: DataFrame, ckpt: Path, out: Path): Unit = {
    val q = df.writeStream
      .format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Append)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("T3 dedup: state store survives a restart (pre-watermark duplicate still dropped)") {
    val src = Files.createTempDirectory("rec_src")
    val ckpt = Files.createTempDirectory("rec_ckpt")
    val out = Files.createTempDirectory("rec_out")
    def stream = StreamOps.dedupWithWatermark(
      spark.readStream.schema(schema).json(src.toString),
      "ts", "10 minutes", Seq("contract"))

    // run 1: two keys; watermark advances to 10:20-0:10 = 10:10
    addFile(src, "b1.json", Seq(
      Tick(ts("2024-01-01 10:15:00"), "A", 1.0, 1),
      Tick(ts("2024-01-01 10:20:00"), "B", 2.0, 2)))
    runUntilDrained(stream, ckpt, out)

    // run 2 (NEW query instance, same checkpoint): an exact duplicate
    // of A's kept row — its ts (10:15) is AHEAD of the recovered
    // watermark (10:10), so if state was recovered it MUST be
    // dropped; if state was lost it would be re-emitted. Plus a new
    // key C and a late watermark-advancer D.
    addFile(src, "b2.json", Seq(
      Tick(ts("2024-01-01 10:15:00"), "A", 1.0, 3), // cross-restart dup
      Tick(ts("2024-01-01 10:25:00"), "C", 3.0, 4),
      Tick(ts("2024-01-01 12:00:00"), "D", 4.0, 5)))
    runUntilDrained(stream, ckpt, out)

    val rows = spark.read.parquet(out.toString)
      .select($"contract", $"seq").as[(String, Long)].collect().sorted
    assert(rows.map(_._1).sorted.toSeq == Seq("A", "B", "C", "D"),
      s"exactly one row per key expected, got: ${rows.toSeq}")
    // the survivor for A must be the FIRST arrival (seq 1), proving
    // the duplicate was dropped by recovered state, not re-keyed
    assert(rows.toMap.apply("A") == 1L, s"A's survivor: ${rows.toSeq}")
  }

  test("T4 windowed agg: closed windows are emitted exactly once across a restart") {
    val src = Files.createTempDirectory("rec2_src")
    val ckpt = Files.createTempDirectory("rec2_ckpt")
    val out = Files.createTempDirectory("rec2_out")
    def stream = StreamOps.windowedAgg(
      spark.readStream.schema(schema).json(src.toString),
      "ts", "10 minutes", "30 minutes", Seq("contract"))

    // run 1: fill window [10:00,10:30), then advance the watermark
    // past it (12:00 - 10min > 10:30) so it closes and EMITS
    addFile(src, "b1.json", Seq(
      Tick(ts("2024-01-01 10:05:00"), "A", 1.0, 1),
      Tick(ts("2024-01-01 10:10:00"), "A", 3.0, 2),
      Tick(ts("2024-01-01 12:00:00"), "A", 5.0, 3)))
    runUntilDrained(stream, ckpt, out)
    val afterRun1 = spark.read.parquet(out.toString).count()
    assert(afterRun1 >= 1, "run 1 closed no window")

    // run 2: advance far enough to close [12:00,12:30) as well; the
    // restart must NOT re-emit the already-closed first window
    addFile(src, "b2.json", Seq(
      Tick(ts("2024-01-01 14:00:00"), "A", 7.0, 4)))
    runUntilDrained(stream, ckpt, out)

    val buckets = spark.read.parquet(out.toString)
      .select($"bucket".cast("string"), $"n_events").as[(String, Long)]
      .collect().toSeq.sorted
    assert(buckets.map(_._1).distinct.size == buckets.size,
      s"a window was emitted twice across the restart: $buckets")
    assert(buckets.contains(("2024-01-01 10:00:00", 2L)),
      s"first window lost or wrong across restart: $buckets")
    assert(buckets.exists(_._1 == "2024-01-01 12:00:00"),
      s"second window missing after restart: $buckets")
  }
}
