package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerStageSubmitted, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

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
  * Kill discipline: the chaos thread waits until the listener has
  * seen the query's tasks actually START (the job is mid-shuffle),
  * then force-kills one `CoarseGrainedExecutorBackend` process chosen
  * from the live fleet. Evidence recorded per query: executor-removed
  * events, failed-task count, stage re-attempts, and the hash
  * equality. The landed guard is TWO-factor (no vacuous passes, the
  * ThetaTransportSpec rule): the removal event must register AND
  * in-run task evidence must exist (failed tasks or stage
  * re-attempts, read at collect return) — a kill landing after the
  * job finished produces a removal with zero failed tasks and FAILS.
  *
  * Prints one JSON line per query plus a summary line:
  * {"query":…,"equal":…,"killed_pid":…,"executors_removed":…,
  *  "tasks_failed":…,"stage_reattempts":…,"wall_healthy_s":…,
  *  "wall_chaos_s":…}
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

  /** Live executor-backend JVMs forked by the local-cluster workers —
    * never this driver JVM (its command line is sbt/ChaosProbe, not
    * the backend class).
    */
  def executorPids(): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val self = ProcessHandle.current().pid()
    ProcessHandle.allProcesses().iterator().asScala
      .filter(p => p.pid() != self && p.isAlive)
      .filter(_.info().commandLine().map[Boolean](
        _.contains("CoarseGrainedExecutorBackend")).orElse(false))
      .map(_.pid()).toSeq.sorted
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q113_winnow_near_dup", "q82_dedup_clusters",
        "q102_leakage_safe_split", "q160_ivfpq_search")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = SessionDefaults.master(cpus)
    require(master.startsWith("local-cluster"),
      s"ChaosProbe needs forked executors: GRAFT_MASTER=local-cluster[...], got $master")
    // Snapshot BEFORE the session forks its fleet: backend JVMs
    // orphaned by earlier (killed) sessions on this box must never be
    // offered to the killer — shooting a zombie registers no
    // executor-removed event and the run fails its own vacuity guard
    // instead of attesting anything.
    val preexisting = executorPids().toSet
    val spark = SessionDefaults.masterConfigs(master).foldLeft(
      SessionDefaults(SparkSession.builder().master(master))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    def fleetPids(): Seq[Long] = executorPids().filterNot(preexisting)
    def waitForFleet(n: Int): Unit = {
      val deadline = System.nanoTime() + 120e9.toLong
      while (fleetPids().size < n && System.nanoTime() < deadline)
        Thread.sleep(250)
      require(fleetPids().size >= n,
        s"fleet never reached $n executors: ${fleetPids()}")
    }
    val fleetSize = master.drop("local-cluster[".length).takeWhile(_ != ',').toInt
    waitForFleet(fleetSize)

    var allEqual = true
    val results = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      spark.catalog.clearCache()

      val t0 = System.nanoTime()
      val healthy = canonicalHash(fn(spark, sfDir).collect())
      val wallHealthy = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()

      // One chaos pass: kill when the fleet is demonstrably BUSY —
      // more in-flight tasks than twice the executor count, so the
      // victim (first fleet pid) almost surely holds running work. A
      // kill that lands on an idle victim (or after the job) leaves
      // zero failed tasks and fails the landed guard; the pass is
      // then retried — we are arranging a coincidence, and an honest
      // miss must not read as either attestation or failure.
      def chaosPass(): (Boolean, Long, Int, Int, Int, Double) = {
        tasksStarted.set(0); tasksEnded.set(0); tasksFailed.set(0)
        executorsRemoved.set(0); stageReattempts.set(0)
        val killedPid = new java.util.concurrent.atomic.AtomicLong(-1L)
        val killer = new Thread(() => {
          val deadline = System.nanoTime() + 30e9.toLong
          def active = tasksStarted.get() - tasksEnded.get()
          while (active < 2 * fleetSize && System.nanoTime() < deadline)
            Thread.sleep(5)
          fleetPids().headOption.foreach { pid =>
            ProcessHandle.of(pid).ifPresent { h =>
              if (h.destroyForcibly()) killedPid.set(pid)
            }
          }
        }, s"chaos-killer-$name")
        killer.setDaemon(true)

        val t1 = System.nanoTime()
        killer.start()
        val chaos = canonicalHash(fn(spark, sfDir).collect())
        // task evidence is read AT collect return: failed tasks /
        // stage re-attempts can only come from a kill that landed
        // mid-run — the in-run witness the async removal event
        // cannot provide
        val failedInRun = tasksFailed.get()
        val reattemptsInRun = stageReattempts.get()
        val wallChaos = (System.nanoTime() - t1) / 1e9
        killer.join(90000)
        // the master's executor-removed event is asynchronous — a
        // kill in the job's last second reports a beat after collect
        val graceDeadline = System.nanoTime() + 15e9.toLong
        while (killedPid.get() > 0 && executorsRemoved.get() == 0 &&
            System.nanoTime() < graceDeadline)
          Thread.sleep(200)
        spark.catalog.clearCache()
        waitForFleet(fleetSize) // re-provision before compare/retry
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
    spark.stop()
    if (!allEqual) sys.exit(1)
  }
}
