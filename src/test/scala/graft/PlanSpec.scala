package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries._

/** Plan-shape assertions — the 100 TB design contract, enforced in CI:
  * filters reach the parquet scan, small dims broadcast, the resample
  * is one hash aggregation (no window shuffle), codegen covers the hot
  * path. A regression here is a scale bug even when results stay
  * correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = plan(RelationalQueries.pricingSummary(spark, dir))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q01: only referenced columns are read") {
    val p = plan(RelationalQueries.pricingSummary(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema) // pruned
    assert(readSchema.contains("l_quantity"))
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = plan(RelationalQueries.revenueByRegion(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q10 resample: aggregation with partial combine, no window operator") {
    val p = plan(TimeSeriesQueries.resampleOhlc1h(spark, dir))
    assert(!p.contains("Window"), "resample must not need a window shuffle")
    // min_by/max_by carry a struct buffer -> SortAggregate; what
    // matters at scale is partial aggregation before ONE exchange
    assert(p.contains("Aggregate"), p)
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one data shuffle, plan:\n$p")
  }

  test("q11 dedup: aggregation-based (partial combine), no row_number window") {
    val p = plan(TimeSeriesQueries.dedupKeepLastQ(spark, dir))
    assert(!p.contains("Window"), "keep-last dedup must use max_by aggregation")
  }

  test("q12 as-of join: one shuffle on the key, no cartesian/range join") {
    val p = plan(TimeSeriesQueries.asofClickPurchase(spark, dir))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("whole-stage codegen covers the scan+filter+project hot path") {
    val df = TimeSeriesQueries.businessHoursDaily(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen subtree"), p.take(500))
  }

  test("q14: events time-range predicate reaches the parquet scan") {
    val p = plan(TimeSeriesQueries.businessHoursDaily(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,") ||
      p.contains("GreaterThanOrEqual(ts,"), p)
  }

  test("q30 knn: query side broadcast against a single corpus pass") {
    val p = plan(SimilarityQueries.knnBruteForce(spark, dir))
    assert(p.contains("Broadcast"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q55 median: percentile_disc aggregate, no whole-table window sort") {
    val p = plan(AnalyticsQueries.discreteMedian(spark, dir))
    assert(!p.contains("Window"), "median must not sort the table through a window")
    assert(p.toLowerCase.contains("percentile"), p)
  }

  test("q15 closest-to-mean: day means broadcast back, no day window") {
    val p = plan(TimeSeriesQueries.closestToMean(spark, dir))
    assert(!p.contains("Window"), "day means must come from agg + broadcast join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q24/q25/q26 near-dup plans: no all-pairs product anywhere") {
    for (q <- Seq(TextQueries.minhashNearDup(spark, dir),
        TextQueries.jaccardPairs(spark, dir),
        TextQueries.simhashNearDup(spark, dir))) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), p.take(300))
    }
  }

  test("native hash expressions compile into whole-stage codegen") {
    // AQE finalizes stages lazily — run the query, then read the
    // codegen dump of the finalized plan; the kernel call must appear
    // in GENERATED code (interpreted fallback would leave the hot
    // path outside codegen)
    def codegenOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    }
    val gen = codegenOf(SessionQueries.rollingFingerprint(spark, dir))
    assert(gen.contains("graft.plans.Kernels.rollingHash"), gen.take(400))
    // q26's simhash projection sits beside a Generate (posexplode),
    // which legally breaks the codegen stage there — assert the
    // expression's doGenCode on a pure projection plan instead
    import org.apache.spark.sql.functions.{array, col, lit}
    val simDf = spark.range(8)
      .select(graft.plans.NativeFunctions.simhash64(
        array(lit("a"), col("id").cast("string"))).as("h"))
      .filter(col("h") =!= 0L)
    val sim = codegenOf(simDf.toDF())
    assert(sim.contains("graft.plans.Kernels.simhash"), sim.take(400))
  }

  test("q34 cosine near-dup: bucket equi-join, no cross product") {
    val p = plan(SimilarityQueries.cosineNearDup(spark, dir))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(300))
  }
}
