package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorAdded, SparkListenerExecutorRemoved}
import org.apache.spark.sql.SparkSession

/** Dynamic-allocation probe (a `main`, like [[ChaosProbe]]): the last
  * SessionDefaults assumption with no witness. `computeWidth` pins
  * compute-dense repartitions to `spark.sql.shuffle.partitions` — a
  * STATIC conf — precisely because `defaultParallelism` under dynamic
  * allocation reflects however few executors happen to be registered
  * at PLAN time (a query planned right after startup would bake that
  * floor in for its whole run). This probe runs a real
  * dynamic-allocation fleet (standalone local-cluster master,
  * shuffle-tracking decommission) scaled down to ONE initial executor
  * and measures:
  *
  *  1. the plan-time gap: `defaultParallelism` at startup vs
  *     [[SessionDefaults.computeWidth]] vs the partition count
  *     [[Tables.loadSpread]] actually produces — the claim is
  *     loadSpread == computeWidth regardless of registration timing;
  *  2. ramp-up under load: a shuffle-heavy registered query runs to
  *     completion while executors are being added mid-job, and its
  *     canonical hash equals a steady-state rerun of the same query
  *     (results must not depend on fleet size trajectory);
  *  3. scale-down + reuse: after idle timeout the fleet shrinks, and
  *     a follow-up query still completes (shuffle-tracking must not
  *     strand needed map outputs).
  *
  * Prints one JSON line:
  * {"metric":"dynalloc_probe","dp_at_start":…,"compute_width":…,
  *  "spread_partitions":…,"width_pinned":…,"execs_added":…,
  *  "execs_removed":…,"hash_equal":…,"requery_ok":…}
  */
object DynAllocProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val queryName = args.drop(1).headOption.getOrElse("q82_dedup_clusters")
    val master = ProbeHarness.requireLocalCluster("DynAllocProbe")
    val spark = ProbeHarness.session(master, Map(
      "spark.dynamicAllocation.enabled" -> "true",
      "spark.dynamicAllocation.shuffleTracking.enabled" -> "true",
      "spark.dynamicAllocation.minExecutors" -> "1",
      "spark.dynamicAllocation.initialExecutors" -> "1",
      "spark.dynamicAllocation.maxExecutors" -> "4",
      "spark.dynamicAllocation.executorIdleTimeout" -> "4s",
      "spark.dynamicAllocation.shuffleTracking.timeout" -> "8s",
      "spark.dynamicAllocation.schedulerBacklogTimeout" -> "1s"))

    val added = new AtomicInteger(0)
    val removed = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorAdded(e: SparkListenerExecutorAdded): Unit =
        added.incrementAndGet()
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
    })

    // 1. plan-time width gap, measured BEFORE any load ramps the fleet
    val dp0 = spark.sparkContext.defaultParallelism
    val width = SessionDefaults.computeWidth(spark)
    val spreadParts = Tables.loadSpread(spark, sfDir, "documents")
      .rdd.getNumPartitions
    val widthPinned = spreadParts == width

    // 2. shuffle-heavy query during ramp-up vs at steady state
    val fn = SparkEntry.queries.getOrElse(queryName,
      sys.error(s"unknown query $queryName"))
    val rampHash = ChaosProbe.canonicalHash(fn(spark, sfDir).collect())
    // ramp evidence snapshots HERE (behind the bus barrier): adds
    // counted later — the requery's own ramp, or the initial executor
    // — must not satisfy the "scaled up during the ramp query" claim
    ProbeHarness.drainListeners(spark)
    val addedDuringRamp = added.get()
    spark.catalog.clearCache()
    val steadyHash = ChaosProbe.canonicalHash(fn(spark, sfDir).collect())
    spark.catalog.clearCache()
    val hashEqual = rampHash == steadyHash

    // 3. let the fleet decay below max, then demand work again
    val decayDeadline = System.nanoTime() + 45e9.toLong
    while (removed.get() == 0 && System.nanoTime() < decayDeadline)
      Thread.sleep(500)
    val requery = fn(spark, sfDir).collect()
    val requeryOk = ChaosProbe.canonicalHash(requery) == steadyHash

    // vacuity guards (the ThetaTransportSpec rule): the probe claims
    // "under ramp-up" and "after decay" — both trajectories must have
    // actually HAPPENED or the three hash checks attest nothing
    // dynamic-allocation-specific
    ProbeHarness.drainListeners(spark)
    val ramped = addedDuringRamp >= 2 // beyond the single initial executor
    val decayed = removed.get() > 0 // idle decommission actually fired

    println(s"""{"metric":"dynalloc_probe","dp_at_start":$dp0,""" +
      s""""compute_width":$width,"spread_partitions":$spreadParts,""" +
      s""""width_pinned":$widthPinned,"execs_added_ramp":$addedDuringRamp,""" +
      s""""execs_added":${added.get()},""" +
      s""""execs_removed":${removed.get()},"ramped":$ramped,""" +
      s""""decayed":$decayed,"hash_equal":$hashEqual,""" +
      s""""requery_ok":$requeryOk}""")
    SessionDefaults.stopAndReap(spark)
    if (!widthPinned || !hashEqual || !requeryOk || !ramped || !decayed)
      sys.exit(1)
  }
}
