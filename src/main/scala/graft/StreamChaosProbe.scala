package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.SparkSession

/** Streaming executor-loss attestation (a `main`, like [[ChaosProbe]]):
  * the state-store recovery path the batch chaos probe cannot reach.
  * StreamRecoverySpec proves state survives a query RESTART; this
  * probe proves it survives an EXECUTOR DEATH inside one continuously
  * running query — the failure mode where the HDFS-backed state
  * store's in-memory maps vanish with the killed JVM and the next
  * micro-batch must reload them from the checkpoint on surviving
  * executors, still dropping a pre-watermark duplicate and still
  * emitting exactly once.
  *
  * Shape: the T3 watermark dedup over a file source. Batch 1 seeds
  * two keys and advances the watermark; one executor is then
  * SIGKILLed (between micro-batches — the cache-loss semantics; the
  * removal event is grace-waited like the batch probe); batch 2
  * replays an exact duplicate of a kept row from AHEAD of the
  * recovered watermark plus two new keys. If state was lost the
  * duplicate re-emits; if recovery works, exactly one row per key
  * survives with batch-1's arrival winning.
  *
  * Prints one JSON line:
  * {"metric":"stream_chaos","killed_pid":…,"executors_removed":…,
  *  "keys":…,"dup_dropped":…,"exactly_once":…}
  */
object StreamChaosProbe {

  case class Tick(ts: Timestamp, contract: String, value: Double, seq: Long)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = SessionDefaults.master(cpus)
    require(master.startsWith("local-cluster"),
      s"StreamChaosProbe needs forked executors: GRAFT_MASTER=local-cluster[...], got $master")
    val preexisting = ChaosProbe.executorPids().toSet
    val spark = SessionDefaults.masterConfigs(master).foldLeft(
      SessionDefaults(SparkSession.builder().master(master))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val removed = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
    })
    def fleetPids(): Seq[Long] =
      ChaosProbe.executorPids().filterNot(preexisting)
    val deadline0 = System.nanoTime() + 120e9.toLong
    while (fleetPids().size < 4 && System.nanoTime() < deadline0)
      Thread.sleep(250)

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

    var killedPid = -1L
    try {
      // batch 1: two keys; watermark advances to 10:20 - 10min = 10:10
      addFile("b1.json", Seq(
        Tick(ts("2024-01-01 10:15:00"), "A", 1.0, 1),
        Tick(ts("2024-01-01 10:20:00"), "B", 2.0, 2)))
      q.processAllAvailable()

      // the kill: one executor's state-store cache dies with its JVM
      fleetPids().headOption.foreach { pid =>
        ProcessHandle.of(pid).ifPresent { h =>
          if (h.destroyForcibly()) killedPid = pid
        }
      }
      val grace = System.nanoTime() + 30e9.toLong
      while (removed.get() == 0 && System.nanoTime() < grace)
        Thread.sleep(200)

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
    val ok = exactlyOnce && dupDropped && removed.get() > 0 && killedPid > 0
    println(s"""{"metric":"stream_chaos","killed_pid":$killedPid,""" +
      s""""executors_removed":${removed.get()},""" +
      s""""keys":${keys.size},"dup_dropped":$dupDropped,"exactly_once":$exactlyOnce}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
