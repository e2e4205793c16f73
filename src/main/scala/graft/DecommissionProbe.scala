package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerExecutorRemoved, SparkListenerStageSubmitted, SparkListenerTaskEnd, SparkListenerTaskStart}

/** Graceful-decommission attestation (a `main`, the [[ChaosProbe]]
  * pattern) — the spot-instance path every cloud fleet runs daily:
  * instead of SIGKILLing an executor (ChaosProbe: shuffle outputs
  * vanish, FetchFailed, stage re-attempts recompute them), send
  * SIGPWR with `spark.decommission.enabled` and the storage-migration
  * confs on, and assert the OPPOSITE outcome: the executor drains,
  * its shuffle map outputs and RDD blocks MIGRATE to peers, and the
  * job completes with ZERO failed tasks and ZERO stage re-attempts —
  * same hash, no recompute.
  *
  * Migration evidence is direct, not inferred: shuffle data/index
  * blocks are tracked by the MapOutputTracker and are NEVER reported
  * to the BlockManager master in normal execution — the ONLY path
  * that registers a `shuffle_*` block through `onBlockUpdated` is the
  * decommissioning BlockManager handing its files to a peer. So
  * `shuffle_blocks_migrated > 0` proves the victim held map outputs
  * and a peer now serves them.
  *
  * Vacuity guards (two-factor, the ChaosProbe rule): the SIGPWR must
  * land on THIS session's fleet, the executor-removed event must
  * register (the drain ends in a real exit), migrated shuffle blocks
  * must be observed, AND the no-recompute claim must hold with task
  * evidence drained behind the listener-bus barrier. A pass where the
  * job finished before the drain began attests nothing and is
  * RETRIED.
  *
  * Prints one JSON line per query plus a summary:
  * {"query":…,"equal":…,"decommissioned_pid":…,"executors_removed":…,
  *  "shuffle_blocks_migrated":…,"rdd_blocks_migrated":…,
  *  "tasks_failed":…,"stage_reattempts":…,"landed":…,"attempts":…,
  *  "wall_healthy_s":…,"wall_decom_s":…}
  */
object DecommissionProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q113_winnow_near_dup", "q160_ivfpq_search")
    val master = ProbeHarness.requireLocalCluster("DecommissionProbe")
    val preexisting = ProbeHarness.executorPids().toSet
    val spark = ProbeHarness.session(master, Map(
      "spark.decommission.enabled" -> "true",
      "spark.storage.decommission.enabled" -> "true",
      "spark.storage.decommission.rddBlocks.enabled" -> "true",
      "spark.storage.decommission.shuffleBlocks.enabled" -> "true"))

    val tasksStarted = new AtomicInteger(0)
    val tasksEnded = new AtomicInteger(0)
    val tasksFailed = new AtomicInteger(0)
    val executorsRemoved = new AtomicInteger(0)
    val stageReattempts = new AtomicInteger(0)
    val shuffleMigrated = new AtomicInteger(0)
    val rddMigrated = new AtomicInteger(0)
    @volatile var signalNanos = Long.MaxValue
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(e: SparkListenerTaskStart): Unit =
        tasksStarted.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasksEnded.incrementAndGet()
        if (e.reason != org.apache.spark.Success) tasksFailed.incrementAndGet()
      }
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        executorsRemoved.incrementAndGet()
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (e.stageInfo.attemptNumber() > 0) stageReattempts.incrementAndGet()
      override def onBlockUpdated(e: SparkListenerBlockUpdated): Unit = {
        val id = e.blockUpdatedInfo.blockId.name
        // shuffle_* through the master = decommission migration, the
        // only writer of that path; rdd_* after the signal = cached
        // blocks re-homed by the decommissioner (before the signal,
        // plain caching posts the same event — time-fenced)
        if (id.startsWith("shuffle_")) shuffleMigrated.incrementAndGet()
        else if (id.startsWith("rdd_") && System.nanoTime() > signalNanos)
          rddMigrated.incrementAndGet()
      }
    })

    val fleetSize = ProbeHarness.fleetSize(master)
    ProbeHarness.waitForFleet(preexisting, fleetSize)

    def sigpwr(pid: Long): Boolean =
      new ProcessBuilder("kill", "-PWR", pid.toString)
        .inheritIO().start().waitFor() == 0

    var allGood = true
    val results = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val healthy = ChaosProbe.canonicalHash(fn(spark, sfDir).collect())
      val wallHealthy = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()

      def decomPass(): (Boolean, Long, Int, Int, Int, Int, Int, Double) = {
        ProbeHarness.drainListeners(spark)
        tasksStarted.set(0); tasksEnded.set(0); tasksFailed.set(0)
        executorsRemoved.set(0); stageReattempts.set(0)
        shuffleMigrated.set(0); rddMigrated.set(0)
        signalNanos = Long.MaxValue
        val victim = new java.util.concurrent.atomic.AtomicLong(-1L)
        val drainer = new Thread(() => {
          val deadline = System.nanoTime() + 30e9.toLong
          // busy fleet AND at least one finished wave: the victim must
          // plausibly HOLD map outputs for migration to attest anything
          def active = tasksStarted.get() - tasksEnded.get()
          while ((active < 2 * fleetSize || tasksEnded.get() < 2 * fleetSize) &&
              System.nanoTime() < deadline)
            Thread.sleep(5)
          ProbeHarness.fleetPids(preexisting).headOption.foreach { pid =>
            signalNanos = System.nanoTime()
            if (sigpwr(pid)) victim.set(pid)
          }
        }, s"decommissioner-$name")
        drainer.setDaemon(true)

        val t1 = System.nanoTime()
        drainer.start()
        val decom = ChaosProbe.canonicalHash(fn(spark, sfDir).collect())
        val wallDecom = (System.nanoTime() - t1) / 1e9
        drainer.join(90000)
        ProbeHarness.drainListeners(spark)
        val failedInRun = tasksFailed.get()
        val reattemptsInRun = stageReattempts.get()
        val migrated = shuffleMigrated.get()
        val rddMig = rddMigrated.get()
        // the drain ends in a real executor exit — grace-wait for the
        // master's asynchronous removal event
        val graceDeadline = System.nanoTime() + 30e9.toLong
        while (victim.get() > 0 && executorsRemoved.get() == 0 &&
            System.nanoTime() < graceDeadline)
          Thread.sleep(200)
        spark.catalog.clearCache()
        ProbeHarness.waitForFleet(preexisting, fleetSize) // master re-provisions
        (healthy == decom, victim.get(), executorsRemoved.get(), migrated,
          rddMig, failedInRun, reattemptsInRun, wallDecom)
      }

      var attempt = 0
      var last = decomPass()
      def landed(r: (Boolean, Long, Int, Int, Int, Int, Int, Double)): Boolean =
        r._2 > 0 && r._3 > 0 && r._4 > 0 && r._6 == 0 && r._7 == 0
      while (attempt < 2 && !landed(last)) {
        attempt += 1
        last = decomPass()
      }
      val (equal, pid, removed, migrated, rddMig, failed, reatt, wallDecom) = last
      val ok = equal && landed(last)
      allGood &&= ok
      println(s"""{"query":"$name","equal":$equal,"decommissioned_pid":$pid,""" +
        s""""executors_removed":$removed,"shuffle_blocks_migrated":$migrated,""" +
        s""""rdd_blocks_migrated":$rddMig,"tasks_failed":$failed,""" +
        s""""stage_reattempts":$reatt,"landed":${landed(last)},"attempts":${attempt + 1},""" +
        f""""wall_healthy_s":$wallHealthy%.2f,"wall_decom_s":$wallDecom%.2f}""")
      (name, ok)
    }

    val failed = results.collect { case (n, ok) if !ok => n }
    println(s"""{"metric":"decommission_probe","queries":${results.size},""" +
      s""""all_landed_no_recompute":$allGood,"failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}""")
    SessionDefaults.stopAndReap(spark)
    if (!allGood) sys.exit(1)
  }
}
