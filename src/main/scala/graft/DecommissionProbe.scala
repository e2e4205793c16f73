package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerExecutorRemoved, SparkListenerStageSubmitted, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

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
  * Each pass runs in a FRESH local-cluster session: a standalone
  * master marks the decommissioned executor's WORKER as
  * decommissioning and will not reliably re-provision it for the same
  * app, so a shared session's fleet shrinks monotonically across
  * passes (observed: a second pass stuck at 3/4 executors). Stopping
  * the session tears down the in-JVM master + workers wholesale; the
  * next pass gets a clean 4-worker cluster. The healthy reference
  * hash is computed inside the same pass session, before the chaos
  * run.
  *
  * Vacuity guards (two-factor, the ChaosProbe rule): the SIGPWR must
  * land on THIS pass's fleet WHILE the job is in flight (a signal
  * after collect returns drains a finished job's leftovers and
  * attests nothing — retried), the executor-removed event must
  * register (grace-waited — the drain is asynchronous and the
  * migration counters are read only after it), migrated shuffle
  * blocks must be observed, and the zero-recompute claim must hold
  * with evidence drained behind the listener-bus barrier.
  *
  * Prints one JSON line per query plus a summary:
  * {"query":…,"equal":…,"decommissioned_pid":…,"executors_removed":…,
  *  "shuffle_blocks_migrated":…,"rdd_blocks_migrated":…,
  *  "tasks_failed":…,"stage_reattempts":…,"landed":…,"attempts":…,
  *  "wall_healthy_s":…,"wall_decom_s":…}
  */
object DecommissionProbe {

  final case class Pass(equal: Boolean, pid: Long, removed: Int,
      migrated: Int, rddMig: Int, failed: Int, reatt: Int,
      inFlight: Boolean, healthyHash: String, wallHealthy: Double, wall: Double)

  private def sigpwr(pid: Long): Boolean =
    new ProcessBuilder("kill", "-PWR", pid.toString)
      .inheritIO().start().waitFor() == 0

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q113_winnow_near_dup", "q160_ivfpq_search")
    val master = ProbeHarness.requireLocalCluster("DecommissionProbe")
    val fleetSize = ProbeHarness.fleetSize(master)

    def decomPass(name: String, knownHealthy: Option[(String, Double)]): Pass = {
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val preexisting = ProbeHarness.executorPids().toSet
      val spark: SparkSession = ProbeHarness.session(master, Map(
        "spark.decommission.enabled" -> "true",
        "spark.storage.decommission.enabled" -> "true",
        "spark.storage.decommission.rddBlocks.enabled" -> "true",
        "spark.storage.decommission.shuffleBlocks.enabled" -> "true"))
      try {
        val tasksStarted = new AtomicInteger(0)
        val tasksEnded = new AtomicInteger(0)
        val tasksFailed = new AtomicInteger(0)
        val executorsRemoved = new AtomicInteger(0)
        val stageReattempts = new AtomicInteger(0)
        val shuffleMigrated = new AtomicInteger(0)
        val rddMigrated = new AtomicInteger(0)
        @volatile var signalNanos = Long.MaxValue
        @volatile var deliveredNanos = Long.MaxValue
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
            // shuffle_* through the master = decommission migration,
            // the only writer of that path — the LOAD-BEARING
            // evidence. rdd_* after the signal = cached blocks
            // re-homed by the decommissioner; plain caching posts the
            // same event class, so this count is time-fenced on
            // listener PROCESSING time — an approximation (bus lag
            // can leak a few pre-signal cache events past the fence),
            // reported as color, never guarded on.
            if (id.startsWith("shuffle_")) shuffleMigrated.incrementAndGet()
            else if (id.startsWith("rdd_") && System.nanoTime() > signalNanos)
              rddMigrated.incrementAndGet()
          }
        })
        ProbeHarness.waitForFleet(preexisting, fleetSize)

        // the reference hash is deterministic and session-independent:
        // compute it once on the first pass, reuse on retries (a retry
        // re-paying the full healthy run attests nothing extra)
        val (healthy, wallHealthy) = knownHealthy.getOrElse {
          val t0 = System.nanoTime()
          val h = ChaosProbe.canonicalHash(fn(spark, sfDir).collect())
          (h, (System.nanoTime() - t0) / 1e9)
        }
        spark.catalog.clearCache()
        ProbeHarness.drainListeners(spark)
        tasksStarted.set(0); tasksEnded.set(0); tasksFailed.set(0)
        executorsRemoved.set(0); stageReattempts.set(0)
        shuffleMigrated.set(0); rddMigrated.set(0)

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
            // rdd-event fence opens BEFORE the signal can possibly
            // deliver (counting wants the earliest bound) …
            signalNanos = System.nanoTime()
            if (sigpwr(pid)) {
              victim.set(pid)
              // … but the IN-FLIGHT check wants the latest bound:
              // kill(2) delivers during the kill process's syscall,
              // which precedes its exit, so a post-waitFor stamp is a
              // sound UPPER bound on delivery — `delivered <
              // collectEnd` can then never hold for a signal that
              // actually landed after the job finished (the stamp
              // being late only makes the guard stricter: a borderline
              // pass retries instead of vacuously landing)
              deliveredNanos = System.nanoTime()
            } else signalNanos = Long.MaxValue // a failed kill fences nothing
          }
        }, s"decommissioner-$name")
        drainer.setDaemon(true)

        val t1 = System.nanoTime()
        drainer.start()
        val decom = ChaosProbe.canonicalHash(fn(spark, sfDir).collect())
        val collectEnd = System.nanoTime()
        val wallDecom = (collectEnd - t1) / 1e9
        drainer.join(90000)
        // the SIGPWR must have DELIVERED while the job was in flight —
        // a signal after collect returned drains leftover blocks of a
        // FINISHED job and attests nothing (the retry rule); the
        // delivery stamp is a post-waitFor upper bound, so this can
        // never falsely pass
        val inFlight = victim.get() > 0 && deliveredNanos < collectEnd
        ProbeHarness.drainListeners(spark)
        val failedInRun = tasksFailed.get()
        val reattemptsInRun = stageReattempts.get()
        // the drain ends in a real executor exit — grace-wait for the
        // master's asynchronous removal event, and only THEN read the
        // migration counters: the block handoff is itself asynchronous
        // and finishes before the executor exits, so reading at
        // collect-return would undercount a drain still in flight
        val graceDeadline = System.nanoTime() + 30e9.toLong
        while (victim.get() > 0 && executorsRemoved.get() == 0 &&
            System.nanoTime() < graceDeadline)
          Thread.sleep(200)
        ProbeHarness.drainListeners(spark)
        Pass(healthy == decom, victim.get(), executorsRemoved.get(),
          shuffleMigrated.get(), rddMigrated.get(), failedInRun,
          reattemptsInRun, inFlight, healthy, wallHealthy, wallDecom)
      } finally SessionDefaults.stopAndReap(spark)
    }

    def landed(r: Pass): Boolean =
      r.pid > 0 && r.inFlight && r.removed > 0 && r.migrated > 0 &&
        r.failed == 0 && r.reatt == 0

    var allGood = true
    val results = names.map { name =>
      var attempt = 0
      var last = decomPass(name, None)
      while (attempt < 2 && !landed(last)) {
        attempt += 1
        last = decomPass(name, Some((last.healthyHash, last.wallHealthy)))
      }
      val ok = last.equal && landed(last)
      allGood &&= ok
      println(s"""{"query":"$name","equal":${last.equal},""" +
        s""""decommissioned_pid":${last.pid},""" +
        s""""executors_removed":${last.removed},""" +
        s""""shuffle_blocks_migrated":${last.migrated},""" +
        s""""rdd_blocks_migrated":${last.rddMig},"tasks_failed":${last.failed},""" +
        s""""stage_reattempts":${last.reatt},"landed":${landed(last)},""" +
        s""""attempts":${attempt + 1},""" +
        f""""wall_healthy_s":${last.wallHealthy}%.2f,"wall_decom_s":${last.wall}%.2f}""")
      (name, ok)
    }

    val failed = results.collect { case (n, ok) if !ok => n }
    println(s"""{"metric":"decommission_probe","queries":${results.size},""" +
      s""""all_landed_no_recompute":$allGood,"failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}""")
    if (!allGood) sys.exit(1)
  }
}
