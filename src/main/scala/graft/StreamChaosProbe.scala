package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}

/** Streaming executor-loss attestation (a `main`, like [[ChaosProbe]]):
  * the state-store recovery path the batch chaos probe cannot reach.
  * StreamRecoverySpec proves state survives a query RESTART; this
  * probe proves it survives executor DEATH inside one continuously
  * running query — and to make the witness airtight it SIGKILLs the
  * ENTIRE fleet between micro-batches: with every executor JVM dead,
  * no warm in-memory state-store map can exist anywhere, so batch 2's
  * dedup decisions can only come from state RELOADED from the
  * checkpoint by the re-provisioned fleet. (Killing one executor
  * would exercise the reload only when the victim happened to own the
  * key's state partition — a ~1/fleet coincidence, i.e. a mostly
  * vacuous pass.)
  *
  * Shape: the T3 watermark dedup over a file source. Batch 1 seeds
  * two keys and advances the watermark; the fleet dies; batch 2 (same
  * running query) replays an exact duplicate of a kept row from AHEAD
  * of the recovered watermark plus two new keys. If state was lost
  * the duplicate re-emits; if recovery works, exactly one row per key
  * survives with batch-1's arrival winning.
  *
  * Prints one JSON line:
  * {"metric":"stream_chaos","killed":…,"executors_removed":…,
  *  "keys":…,"dup_dropped":…,"exactly_once":…}
  */
object StreamChaosProbe {

  case class Tick(ts: Timestamp, contract: String, value: Double, seq: Long)

  def main(args: Array[String]): Unit = {
    val master = ProbeHarness.requireLocalCluster("StreamChaosProbe")
    val preexisting = ProbeHarness.executorPids().toSet
    val spark = ProbeHarness.session(master)
    import spark.implicits._

    val removed = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
    })
    val fleetSize = ProbeHarness.fleetSize(master)
    ProbeHarness.waitForFleet(preexisting, fleetSize)

    val src = Files.createTempDirectory("schaos_src")
    val ckpt = Files.createTempDirectory("schaos_ckpt")
    val out = Files.createTempDirectory("schaos_out")
    def ts(s: String) = Timestamp.valueOf(s)
    def addFile(name: String, rows: Seq[Tick]): Unit = {
      val tmp = Files.createTempDirectory("schaos_stage")
      rows.toDF().coalesce(1).write.mode("overwrite").json(tmp.toString)
      val listing = Files.list(tmp)
      val part = try listing.toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".json")).get
      finally listing.close()
      Files.move(part, src.resolve(name))
    }

    val schema = Seq.empty[Tick].toDF().schema
    val stream = graft.streaming.StreamOps.dedupWithWatermark(
      spark.readStream.schema(schema).json(src.toString),
      "ts", "10 minutes", Seq("contract"))
    val q = stream.writeStream
      .format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()

    var killed = 0
    try {
      // batch 1: two keys; watermark advances to 10:20 - 10min = 10:10
      addFile("b1.json", Seq(
        Tick(ts("2024-01-01 10:15:00"), "A", 1.0, 1),
        Tick(ts("2024-01-01 10:20:00"), "B", 2.0, 2)))
      q.processAllAvailable()

      // the kill: the WHOLE fleet dies — every executor's state-store
      // cache is gone; only the checkpoint remains
      val victims = ProbeHarness.fleetPids(preexisting)
      victims.foreach { pid =>
        ProcessHandle.of(pid).ifPresent { h =>
          if (h.destroyForcibly()) killed += 1
        }
      }
      val grace = System.nanoTime() + 60e9.toLong
      while (removed.get() < killed && System.nanoTime() < grace)
        Thread.sleep(200)
      // the master re-provisions; wait so batch 2 runs on FRESH JVMs
      ProbeHarness.waitForFleet(preexisting ++ victims, fleetSize)

      // batch 2 ON THE SAME RUNNING QUERY: A's kept row replayed from
      // ahead of the watermark (must be dropped by RELOADED state),
      // plus two new keys
      addFile("b2.json", Seq(
        Tick(ts("2024-01-01 10:15:00"), "A", 1.0, 3), // cross-kill dup
        Tick(ts("2024-01-01 10:25:00"), "C", 3.0, 4),
        Tick(ts("2024-01-01 12:00:00"), "D", 4.0, 5)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(out.toString)
      .select($"contract", $"seq").as[(String, Long)].collect().sorted.toSeq
    val keys = rows.map(_._1)
    val exactlyOnce = keys == keys.distinct && keys.sorted == Seq("A", "B", "C", "D")
    val dupDropped = rows.toMap.get("A").contains(1L)
    val ok = exactlyOnce && dupDropped && removed.get() > 0 && killed == fleetSize
    println(s"""{"metric":"stream_chaos","killed":$killed,""" +
      s""""executors_removed":${removed.get()},""" +
      s""""keys":${keys.size},"dup_dropped":$dupDropped,"exactly_once":$exactlyOnce}""")
    SessionDefaults.stopAndReap(spark)
    if (!ok) sys.exit(1)
  }
}
