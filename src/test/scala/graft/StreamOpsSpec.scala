package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

case class Tick(ts: Timestamp, contract: String, value: Double, seq: Long)

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ticks = Seq(
    Tick(ts("2024-01-01 10:00:00"), "A", 1.0, 1),
    Tick(ts("2024-01-01 10:05:00"), "A", 2.0, 2),
    Tick(ts("2024-01-01 10:05:00"), "A", 2.0, 3), // duplicate key+ts
    Tick(ts("2024-01-01 10:40:00"), "A", 3.0, 4),
    Tick(ts("2024-01-01 10:02:00"), "B", 5.0, 5),
    Tick(ts("2024-01-01 11:30:00"), "A", 7.0, 6)) // advances watermark past 10:xx

  test("streaming windowed agg emits closed windows matching batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val agg = StreamOps.windowedAgg(
      input.toDF(), "ts", "10 minutes", "30 minutes", Seq("contract"))
    val q = agg.writeStream
      .format("memory").queryName("win_out").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt").toString)
      .start()
    try {
      input.addData(ticks: _*)
      q.processAllAvailable()
      input.addData(Tick(ts("2024-01-01 13:00:00"), "A", 0.0, 7)) // close all
      q.processAllAvailable()
      val out = spark.table("win_out")
        .select($"bucket", $"contract", $"n_events", $"high", $"low", $"volume")
        .orderBy($"bucket", $"contract")
        .collect()
      // batch equivalent over the same rows
      val batch = StreamOps.windowedAgg(
          ticks.toDF().union(Seq(Tick(ts("2024-01-01 13:00:00"), "A", 0.0, 7)).toDF()),
          "ts", "10 minutes", "30 minutes", Seq("contract"))
        .select($"bucket", $"contract", $"n_events", $"high", $"low", $"volume")
        .orderBy($"bucket", $"contract")
        .collect()
      assert(out.nonEmpty)
      // stream (append mode) emits only watermark-closed windows; all
      // emitted rows must match the batch computation exactly
      val batchMap = batch.map(r => (r.getAs[Timestamp]("bucket"), r.getString(1)) -> r).toMap
      out.foreach { r =>
        val key = (r.getAs[Timestamp]("bucket"), r.getString(1))
        assert(batchMap.contains(key), s"unexpected window $key")
        assert(batchMap(key).toSeq == r.toSeq, s"mismatch at $key")
      }
    } finally q.stop()
  }

  test("streaming SLIDING windows emit closed hops matching batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val agg = StreamOps.windowedAgg(
      input.toDF(), "ts", "10 minutes", "30 minutes", Seq("contract"),
      slide = Some("10 minutes"))
    val q = agg.writeStream
      .format("memory").queryName("slide_out").outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_slide").toString)
      .start()
    try {
      input.addData(ticks: _*)
      q.processAllAvailable()
      input.addData(Tick(ts("2024-01-01 13:00:00"), "A", 0.0, 7))
      q.processAllAvailable()
      val out = spark.table("slide_out")
        .select($"bucket", $"contract", $"n_events", $"high", $"low", $"volume")
        .orderBy($"bucket", $"contract").collect()
      val batch = StreamOps.windowedAgg(
          ticks.toDF().union(Seq(Tick(ts("2024-01-01 13:00:00"), "A", 0.0, 7)).toDF()),
          "ts", "10 minutes", "30 minutes", Seq("contract"),
          slide = Some("10 minutes"))
        .select($"bucket", $"contract", $"n_events", $"high", $"low", $"volume")
        .orderBy($"bucket", $"contract").collect()
      // every event belongs to 3 hops; emitted closed hops match batch
      assert(out.length >= 3 * 2)
      val batchMap = batch.map(r => (r.getAs[Timestamp]("bucket"), r.getString(1)) -> r).toMap
      out.foreach { r =>
        val key = (r.getAs[Timestamp]("bucket"), r.getString(1))
        assert(batchMap.contains(key), s"unexpected hop $key")
        assert(batchMap(key).toSeq == r.toSeq, s"mismatch at $key")
      }
    } finally q.stop()
  }

  test("watermarked dedup drops duplicate (key, ts) rows on the stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val dd = StreamOps.dedupWithWatermark(input.toDF(), "ts", "10 minutes",
      Seq("contract"))
    val q = dd.writeStream
      .format("memory").queryName("dedup_out").outputMode(OutputMode.Append)
      .option("checkpointLocation", Files.createTempDirectory("ckpt2").toString)
      .start()
    try {
      input.addData(ticks: _*)
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.length == ticks.length - 1) // one exact dup dropped
    } finally q.stop()
  }

  test("latestSnapshot keeps one row per contract (micro-batch refresh)") {
    val snap = StreamOps.latestSnapshot(ticks.toDF(), "ts", Seq("contract"), Seq("seq"))
      .orderBy("contract").collect()
    assert(snap.map(r => (r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("A", 7.0), ("B", 5.0)))
  }

  test("foreachBatch snapshot refresh upserts latest row per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    var snapshot = Seq.empty[Tick].toDF()
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val latest = StreamOps.latestSnapshot(batch, "ts", Seq("contract"), Seq("seq"))
        snapshot =
          if (snapshot.isEmpty) latest
          else StreamOps.latestSnapshot(
            snapshot.unionByName(latest), "ts", Seq("contract"), Seq("seq"))
        snapshot = snapshot.localCheckpoint() // pin the micro-batch result
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("ckpt3").toString)
      .start()
    try {
      input.addData(
        Tick(ts("2024-01-01 10:00:00"), "A", 1.0, 1),
        Tick(ts("2024-01-01 10:05:00"), "B", 2.0, 2))
      q.processAllAvailable()
      input.addData(
        Tick(ts("2024-01-01 10:10:00"), "A", 9.0, 3), // newer A
        Tick(ts("2024-01-01 09:00:00"), "B", 0.0, 4)) // older B: ignored
      q.processAllAvailable()
      val rows = snapshot.orderBy("contract").collect()
        .map(r => (r.getAs[String]("contract"), r.getAs[Double]("value")))
      assert(rows.toSeq == Seq(("A", 9.0), ("B", 2.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer closes sessions on gap and timeout") {
    import graft.streaming.StatefulSessions
    import graft.streaming.StatefulSessions.{Event, Session}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = StatefulSessions.sessionize(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", Files.createTempDirectory("ckpt4").toString)
      .start()
    try {
      input.addData(
        Event(1L, ts("2024-01-01 10:00:00"), 1.0),
        Event(1L, ts("2024-01-01 10:10:00"), 2.0), // same session
        Event(1L, ts("2024-01-01 11:30:00"), 3.0), // gap > 30m: closes first
        Event(2L, ts("2024-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      // advance watermark far enough to time out all open sessions
      input.addData(Event(3L, ts("2024-01-01 15:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Event(3L, ts("2024-01-01 20:00:00"), 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_out").as[Session]
        .collect().sortBy(s => (s.userId, s.sessionStart.getTime))
      val u1 = sessions.filter(_.userId == 1L)
      assert(u1.length == 2)
      assert(u1(0).nEvents == 2 && u1(0).totalValue == 3.0)
      assert(u1(1).nEvents == 1 && u1(1).totalValue == 3.0)
      assert(sessions.count(_.userId == 2L) == 1)
    } finally q.stop()
  }
}
