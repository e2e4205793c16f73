package graft

import org.apache.spark.sql.SparkSession

/** AQE-skew-join vs manual-cap A/B (a `main`): the q25 hot-shingle
  * df-cap (TextQueries.jaccardPairsCapped, results provably invariant
  * — JaccardCapSpec) predates any reliance on AQE's own
  * `skewJoin` splitting. The open question from the r18 verdict: does
  * AQE alone hold the skew ratios, letting the cap simplify away?
  *
  * The structural answer this probe measures: the inverted index's
  * skew term is candidate VOLUME — a shingle of document frequency df
  * contributes df² join output rows — while AQE skew-join splits a
  * skewed SHUFFLE PARTITION across tasks (duplicating the matching
  * side). Splitting parallelizes the df² work; the cap ELIMINATES it
  * (hot shingles skip candidate generation and add back exactly on
  * already-candidate pairs). So AQE should improve uncapped wall by
  * at most the parallelism it recovers, never approach the capped
  * plan, and leave CPU quadratic.
  *
  * Cells, on a deterministic 1-in-`mod` subsample of the sf1skew
  * corpus (the planted 20%-boilerplate skew survives sampling; the
  * full sf1skew uncapped plan generates ~10⁹ candidate rows — the
  * subsample keeps the A/B finite while preserving the df² shape):
  *
  *  1. `capped`        — the shipped maxDf=1000 plan, AQE defaults
  *  2. `uncapped_aqe`  — maxDf=∞, skewJoin forced hot (threshold 1 MB,
  *                       factor 2 — AQE's best shot, not its defaults)
  *  3. `uncapped_noaqe`— maxDf=∞, skewJoin off (the parallelism
  *                       baseline AQE is credited against)
  *
  * The two UNCAPPED cells must hash-equal (AQE may move bytes, never
  * results). Capped output is NOT expected to equal uncapped on
  * SKEWED data: the cap's documented carve-out — a pair is lost only
  * when EVERY shared shingle is hot — is exactly the
  * boilerplate-only-overlap class on sf1skew, which belongs to the
  * q107/q162 boilerplate tier, not to near-dup detection; the probe
  * reports `pairs_lost_to_cap` so the carve-out is priced, not
  * hidden. Per cell: min-of-N wall, task-CPU, output rows, and
  * whether the final plan carries an AQE `skew=true` join marker —
  * reported, not guarded: AQE's skew detector is BYTE-thresholded,
  * and the inverted index's skew term is row²-COMPUTE at small
  * bytes, so "AQE never marked anything" is itself the measured
  * answer.
  *
  * Prints one JSON line per cell plus a summary.
  */
object SkewAqeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("probe_data/sf1skew")
    val mod = if (args.length > 1) args(1).toInt else 10
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = SessionDefaults.master(cpus)
    val spark = SessionDefaults.masterConfigs(master).foldLeft(
      SessionDefaults(SparkSession.builder().master(master))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMetrics = TaskMetricsProbe.install(spark)
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"doc_id" % mod === 0)

    final case class Cell(name: String, maxDf: Int, confs: Map[String, String])
    val cells = Seq(
      Cell("capped", graft.queries.TextQueries.jaccardMaxDf, Map(
        "spark.sql.adaptive.skewJoin.enabled" -> "true")),
      Cell("uncapped_aqe", Int.MaxValue, Map(
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m")),
      Cell("uncapped_noaqe", Int.MaxValue, Map(
        "spark.sql.adaptive.skewJoin.enabled" -> "false",
        // restore what the previous cell lowered: advisory partition
        // size is read by AQE partition COALESCING regardless of
        // skewJoin.enabled (inert under the local profile, which
        // disables coalescing — restored anyway so the baseline is a
        // true defaults baseline under ANY profile)
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")))

    val results = cells.map { cell =>
      cell.confs.foreach { case (k, v) => spark.conf.set(k, v) }
      var rows = -1L
      var hash = ""
      var skewMarked = false
      val walls = (1 to passes).map { _ =>
        spark.catalog.clearCache()
        TaskMetricsProbe.drain(spark)
        val tm0 = taskMetrics.snapshot()
        val t0 = System.nanoTime()
        val df = graft.queries.TextQueries
          .jaccardPairsCappedCore(docs, cell.maxDf)
          .orderBy($"source", $"i", $"j")
        val out = df.collect()
        val wall = (System.nanoTime() - t0) / 1e9
        TaskMetricsProbe.drain(spark)
        val cpu = (taskMetrics.snapshot() - tm0).cpuS
        rows = out.length.toLong
        hash = ChaosProbe.canonicalHash(out)
        skewMarked ||= df.queryExecution.executedPlan.toString.contains("skew=true")
        (wall, cpu)
      }
      // each cell sets EVERY conf the previous cell touched (the
      // uncapped_noaqe cell restores the lowered knobs explicitly —
      // advisory size is not gated on skewJoin.enabled)
      val wall = walls.map(_._1).min
      val cpu = walls.map(_._2).min
      println(f"""{"cell":"${cell.name}","wall_s":$wall%.2f,"cpu_task_s":$cpu%.2f,""" +
        s""""rows":$rows,"hash":"$hash","skew_marked":$skewMarked,""" +
        s""""walls":[${walls.map(w => f"${w._1}%.2f").mkString(",")}]}""")
      (cell.name, wall, hash, skewMarked, rows)
    }

    val uncapped = results.filter(_._1.startsWith("uncapped"))
    val uncappedEqual = uncapped.map(_._3).distinct.size == 1
    val aqeMarked = results.find(_._1 == "uncapped_aqe").exists(_._4)
    val lost = uncapped.head._5 - results.head._5
    println(s"""{"metric":"skew_aqe_probe","cells":${results.size},""" +
      s""""uncapped_hashes_equal":$uncappedEqual,"aqe_skew_marked":$aqeMarked,""" +
      f""""capped_wall_s":${results.head._2}%.2f,"pairs_lost_to_cap":$lost}""")
    SessionDefaults.stopAndReap(spark)
    if (!uncappedEqual) sys.exit(1)
  }
}
