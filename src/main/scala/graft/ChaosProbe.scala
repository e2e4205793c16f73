package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerStageSubmitted, SparkListenerTaskEnd, SparkListenerTaskStart}

/** Deliberate-executor-loss attestation (a `main`, like [[Bench]]):
  * under `GRAFT_MASTER=local-cluster[w,c,m]` — the only master that
  * forks REAL executor JVMs — run each probe query twice: once
  * healthy to fix the expected result hash, once while this driver
  * kills one executor JVM (SIGKILL via ProcessHandle) mid-flight. The
  * claim being attested is the weekly reality of any 1000-executor
  * fleet: an executor dies, its shuffle map outputs vanish,
  * MetadataFetchFailed triggers stage retry, the standalone master
  * re-allocates an executor, and the job completes with EXACTLY the
  * same result. DESIGN.md argued this; this probe executes it.
  *
  * Kill discipline: the chaos thread waits until the fleet is
  * demonstrably BUSY (in-flight tasks > 2× executor count — a victim
  * chosen during a one-task training stage is idle and the kill
  * disturbs nothing), then force-kills one
  * `CoarseGrainedExecutorBackend` chosen from THIS session's fleet
  * (pre-session pids excluded — shooting a zombie attests nothing).
  * The landed guard is TWO-factor (no vacuous passes, the
  * ThetaTransportSpec rule): the removal event must register AND
  * in-run task evidence must exist (failed tasks or stage
  * re-attempts, drained and read after collect) — a kill landing
  * after the job finished produces a removal with zero failed tasks
  * and the pass is RETRIED (arranging a coincidence honestly means a
  * miss is neither an attestation nor a failure). Counters are reset
  * only behind a listener-bus quiescence barrier so a previous
  * pass's late events can never masquerade as this pass's evidence.
  *
  * Prints one JSON line per query plus a summary line:
  * {"query":…,"equal":…,"killed_pid":…,"executors_removed":…,
  *  "tasks_failed":…,"stage_reattempts":…,"landed":…,"attempts":…,
  *  "wall_healthy_s":…,"wall_chaos_s":…}
  */
object ChaosProbe {

  /** Canonical result hash: rows rendered, sorted, md5'd — order- and
    * partitioning-independent, so a healthy and a post-retry run
    * compare by content only.
    */
  def canonicalHash(rows: Array[org.apache.spark.sql.Row]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map(_.toString).sorted.foreach(s => md.update(s.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Live executor-backend JVMs (see [[ProbeHarness.executorPids]]). */
  def executorPids(): Seq[Long] = ProbeHarness.executorPids()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q113_winnow_near_dup", "q82_dedup_clusters",
        "q102_leakage_safe_split", "q160_ivfpq_search")
    val master = ProbeHarness.requireLocalCluster("ChaosProbe")
    val preexisting = ProbeHarness.executorPids().toSet
    val spark = ProbeHarness.session(master)

    // per-run chaos telemetry
    val tasksStarted = new AtomicInteger(0)
    val tasksEnded = new AtomicInteger(0)
    val tasksFailed = new AtomicInteger(0)
    val executorsRemoved = new AtomicInteger(0)
    val stageReattempts = new AtomicInteger(0)
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
    })

    val fleetSize = ProbeHarness.fleetSize(master)
    ProbeHarness.waitForFleet(preexisting, fleetSize)

    var allEqual = true
    val results = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      spark.catalog.clearCache()

      val t0 = System.nanoTime()
      val healthy = canonicalHash(fn(spark, sfDir).collect())
      val wallHealthy = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()

      def chaosPass(): (Boolean, Long, Int, Int, Int, Double) = {
        // quiescence barrier BEFORE the reset: late events of the
        // previous pass must not count as this pass's evidence
        ProbeHarness.drainListeners(spark)
        tasksStarted.set(0); tasksEnded.set(0); tasksFailed.set(0)
        executorsRemoved.set(0); stageReattempts.set(0)
        val killedPid = new java.util.concurrent.atomic.AtomicLong(-1L)
        val killer = new Thread(() => {
          val deadline = System.nanoTime() + 30e9.toLong
          def active = tasksStarted.get() - tasksEnded.get()
          while (active < 2 * fleetSize && System.nanoTime() < deadline)
            Thread.sleep(5)
          killedPid.set(ProbeHarness.killOne(preexisting))
        }, s"chaos-killer-$name")
        killer.setDaemon(true)

        val t1 = System.nanoTime()
        killer.start()
        val chaos = canonicalHash(fn(spark, sfDir).collect())
        val wallChaos = (System.nanoTime() - t1) / 1e9
        killer.join(90000)
        // drain, THEN read: in-run failure events may still be queued
        // at collect return; a post-job kill generates none, so the
        // drained counters are exact in-run evidence either way
        ProbeHarness.drainListeners(spark)
        val failedInRun = tasksFailed.get()
        val reattemptsInRun = stageReattempts.get()
        // the master's executor-removed event is asynchronous — a
        // kill in the job's last second reports a beat after collect
        val graceDeadline = System.nanoTime() + 15e9.toLong
        while (killedPid.get() > 0 && executorsRemoved.get() == 0 &&
            System.nanoTime() < graceDeadline)
          Thread.sleep(200)
        spark.catalog.clearCache()
        ProbeHarness.waitForFleet(preexisting, fleetSize) // re-provision
        (healthy == chaos, killedPid.get(), executorsRemoved.get(),
          failedInRun, reattemptsInRun, wallChaos)
      }

      var attempt = 0
      var last = chaosPass()
      while (attempt < 2 && !(last._3 > 0 && (last._4 > 0 || last._5 > 0))) {
        attempt += 1
        last = chaosPass()
      }
      val (equal, killedPid, removed, failedInRun, reattemptsInRun, wallChaos) = last
      // vacuity guard, two-factor: the kill must have registered
      // (removal event, grace-waited) AND left in-run task evidence
      val landed = killedPid > 0 && removed > 0 &&
        (failedInRun > 0 || reattemptsInRun > 0)
      allEqual &&= (equal && landed)
      println(s"""{"query":"$name","equal":$equal,"killed_pid":$killedPid,""" +
        s""""executors_removed":$removed,"tasks_failed":$failedInRun,""" +
        s""""stage_reattempts":$reattemptsInRun,"landed":$landed,"attempts":${attempt + 1},""" +
        f""""wall_healthy_s":$wallHealthy%.2f,"wall_chaos_s":$wallChaos%.2f}""")
      (name, equal, landed)
    }

    val failed = results.collect { case (n, eq, landed) if !eq || !landed => n }
    println(s"""{"metric":"chaos_probe","queries":${results.size},""" +
      s""""all_equal_and_landed":$allEqual,"failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}""")
    SessionDefaults.stopAndReap(spark)
    if (!allEqual) sys.exit(1)
  }
}
