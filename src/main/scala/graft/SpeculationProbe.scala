package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}

/** Speculative-execution attestation (a `main`, the [[ChaosProbe]]
  * pattern): every query in this engine is deterministic BY
  * CONSTRUCTION (seeded sampling, total-order tie-breaks, no
  * partition-order dependence) — DESIGN.md's standing claim. Task
  * CLONING is the one scheduler behavior that claim had never met:
  * under `spark.speculation=true` a straggler's clone runs the same
  * partition twice concurrently, and anything non-deterministic
  * (RNG seeded off task attempt, accumulator double-counts,
  * first-wins side effects) silently corrupts results on any real
  * fleet that enables speculation.
  *
  * Probe: under the forked-executor master, run the seeded-sampling /
  * shuffle-placement queries (the nondeterminism-suspect class) once
  * in a clean session → reference hashes; then in a second session
  * with AGGRESSIVE speculation (quantile 0.4, multiplier 1.01, 10 ms
  * scan interval, efficiency gate OFF — tuned to actually trigger,
  * not to be realistic) and assert hash equality.
  *
  * What a single box CAN and CANNOT attest: the scheduler MARKS
  * straggling tasks speculatable (SparkListenerSpeculativeTaskSubmitted
  * — the decision path, attested here), but a speculative attempt only
  * LAUNCHES on a host with no existing attempt
  * (TaskSetManager.dequeueSpeculativeTask's hasAttemptOnHost
  * exclusion), and every local-cluster executor shares one host — so
  * clone LAUNCHES are structurally zero here and
  * `speculative_tasks_launched` is reported for honesty, not
  * guarded on. The both-attempts-execute semantics (same partition
  * evaluated twice, one result wins, content unchanged) is already
  * attested by ChaosProbe's stage re-attempts, which re-run completed
  * tasks' partitions wholesale through the same deterministic plans.
  *
  * Vacuity guard: speculatable MARKS must be positive fleet-wide — a
  * pass where the scheduler never considered cloning attests nothing.
  *
  * Prints one JSON line per query plus a summary:
  * {"query":…,"equal":…,"speculatable_marked":…,
  *  "speculative_tasks_launched":…,"killed_tasks":…,
  *  "wall_ref_s":…,"wall_spec_s":…}
  */
object SpeculationProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q37_stratified_sample", "q97_ivf_kmeans",
        "q104_corpus_shuffle_split", "q161_training_shuffle")
    val master = ProbeHarness.requireLocalCluster("SpeculationProbe")

    // session 1: reference hashes, speculation off (the default)
    val pre1 = ProbeHarness.executorPids().toSet
    val ref = {
      val spark = ProbeHarness.session(master)
      ProbeHarness.waitForFleet(pre1, ProbeHarness.fleetSize(master))
      val hashes = names.map { name =>
        val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val h = ChaosProbe.canonicalHash(fn(spark, sfDir).collect())
        name -> (h, (System.nanoTime() - t0) / 1e9)
      }.toMap
      SessionDefaults.stopAndReap(spark)
      hashes
    }

    // session 2: aggressive speculation — clone early, clone often
    val pre2 = ProbeHarness.executorPids().toSet
    val spark = ProbeHarness.session(master, Map(
      "spark.speculation" -> "true",
      "spark.speculation.interval" -> "10ms",
      "spark.speculation.multiplier" -> "1.01",
      "spark.speculation.quantile" -> "0.4",
      // Spark 3.4+ gates speculation on per-task data-processing-rate
      // "inefficiency" — uniform healthy tasks are all efficient, so
      // with the gate on NOTHING clones on a quiet box and the probe
      // can't exercise the behavior it exists to attest. Off = the
      // classic runtime-quantile rule.
      "spark.speculation.efficiency.enabled" -> "false"))
    val marked = new AtomicInteger(0)
    val speculative = new AtomicInteger(0)
    val killed = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onSpeculativeTaskSubmitted(
          e: org.apache.spark.scheduler.SparkListenerSpeculativeTaskSubmitted): Unit =
        marked.incrementAndGet()
      override def onTaskStart(e: SparkListenerTaskStart): Unit =
        if (e.taskInfo.speculative) speculative.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = e.reason match {
        case _: org.apache.spark.TaskKilled => killed.incrementAndGet()
        case _ => ()
      }
    })
    ProbeHarness.waitForFleet(pre2, ProbeHarness.fleetSize(master))

    var allEqual = true
    var totalMarked = 0
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      ProbeHarness.drainListeners(spark)
      marked.set(0); speculative.set(0); killed.set(0)
      val t0 = System.nanoTime()
      val h = ChaosProbe.canonicalHash(fn(spark, sfDir).collect())
      val wall = (System.nanoTime() - t0) / 1e9
      ProbeHarness.drainListeners(spark)
      val (refHash, refWall) = ref(name)
      val equal = h == refHash
      allEqual &&= equal
      totalMarked += marked.get()
      println(s"""{"query":"$name","equal":$equal,""" +
        s""""speculatable_marked":${marked.get()},""" +
        s""""speculative_tasks_launched":${speculative.get()},""" +
        s""""killed_tasks":${killed.get()},""" +
        f""""wall_ref_s":$refWall%.2f,"wall_spec_s":$wall%.2f}""")
      (name, equal)
    }

    val failed = results.collect { case (n, eq) if !eq => n }
    val landed = totalMarked > 0
    println(s"""{"metric":"speculation_probe","queries":${results.size},""" +
      s""""all_equal":$allEqual,"speculatable_marked_total":$totalMarked,""" +
      s""""landed":$landed,"failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}""")
    SessionDefaults.stopAndReap(spark)
    if (!allEqual || !landed) sys.exit(1)
  }
}
