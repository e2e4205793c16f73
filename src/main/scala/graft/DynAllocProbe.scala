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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = SessionDefaults.master(cpus)
    require(master.startsWith("local-cluster"),
      s"DynAllocProbe needs a standalone fleet: GRAFT_MASTER=local-cluster[...], got $master")
    val spark = SessionDefaults.masterConfigs(master).foldLeft(
      SessionDefaults(SparkSession.builder().master(master))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.dynamicAllocation.enabled", "true")
        .config("spark.dynamicAllocation.shuffleTracking.enabled", "true")
        .config("spark.dynamicAllocation.minExecutors", "1")
        .config("spark.dynamicAllocation.initialExecutors", "1")
        .config("spark.dynamicAllocation.maxExecutors", "4")
        .config("spark.dynamicAllocation.executorIdleTimeout", "4s")
        .config("spark.dynamicAllocation.shuffleTracking.timeout", "8s")
        .config("spark.dynamicAllocation.schedulerBacklogTimeout", "1s")) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
    val ramped = added.get() >= 2 // beyond the single initial executor
    val decayed = removed.get() > 0 // idle decommission actually fired

    println(s"""{"metric":"dynalloc_probe","dp_at_start":$dp0,""" +
      s""""compute_width":$width,"spread_partitions":$spreadParts,""" +
      s""""width_pinned":$widthPinned,"execs_added":${added.get()},""" +
      s""""execs_removed":${removed.get()},"ramped":$ramped,""" +
      s""""decayed":$decayed,"hash_equal":$hashEqual,""" +
      s""""requery_ok":$requeryOk}""")
    spark.stop()
    if (!widthPinned || !hashEqual || !requeryOk || !ramped || !decayed)
      sys.exit(1)
  }
}
