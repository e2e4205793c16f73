package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.queries.TextQueries

/** The q24 band-bucket cap (lshBandMaxDf, shared by q82/q128/q131
  * consumers and q147) is a candidate-generation bound: a bucket with
  * more members than the cap is excluded from the LSH self-join. On
  * the natural corpus (max occupancy 13 at sf0.1, 3 at sf0.01) the
  * default cap must not change a single pair; a planted boilerplate
  * clique bigger than the cap must be dropped WITHOUT touching pairs
  * from cool buckets (the documented drop semantics, mirrored in the
  * DuckDB oracle's HAVING clause).
  */
class BandCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def rows(maxDf: Int): Seq[(Long, Long, Double)] =
    TextQueries.minhashNearDupCore(
        Tables.loadSpread(spark, dir, "documents"), maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq

  test("default band cap leaves the corpus result invariant") {
    val uncapped = rows(Int.MaxValue)
    assert(uncapped.nonEmpty) // corpus has planted near-dups
    assert(rows(TextQueries.lshBandMaxDf) == uncapped)
    spark.catalog.clearCache()
  }

  test("plan construction is pure: building the q24 frame launches zero jobs") {
    // the hot-bucket exclusion used to probe `limit(1).count()` at
    // PLAN time; it must now be lazy — a listener counts job starts
    // while the whole q24-family DataFrame (plan only) is built
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    // resolve the source BEFORE listening: spark.read.parquet pays its
    // own footer/listing jobs, which are the scan's, not the query's
    val docs = Tables.loadSpread(spark, dir, "documents")
    val planJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (js.properties != null &&
            "bandcap-marker" == js.properties.getProperty("spark.jobGroup.id"))
          markerSeen.incrementAndGet()
        else planJobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = TextQueries.minhashNearDupCore(docs, TextQueries.lshBandMaxDf)
      df.queryExecution.optimizedPlan // force analysis + optimization
      // the listener bus is async and FIFO: run one tagged marker job
      // and wait for ITS event — any construction-time job event would
      // have to arrive before it
      spark.sparkContext.setJobGroup("bandcap-marker", "listener flush")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime + 5L * 1000 * 1000 * 1000
      while (markerSeen.get() == 0 && System.nanoTime < deadline) Thread.sleep(10)
      assert(markerSeen.get() > 0, "listener flush marker never observed")
      assert(planJobs.get() == 0,
        s"constructing the q24 plan launched ${planJobs.get()} Spark job(s)")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
  }

  test("an oversized clique is dropped; cool-bucket pairs survive untouched") {
    import spark.implicits._
    // clique: cap+4 exact copies of one text — identical shingle sets,
    // so every band bucket they occupy holds the whole clique; plus two
    // near-dup docs that share no band bucket with the clique
    val cap = 8
    val clique = (0 until cap + 4).map(i =>
      (i.toLong, "terms of service apply to all content on this site today"))
    val pairDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "the quick brown fox jumps over the lazy dog again and once"))
    val docs: DataFrame = (clique ++ pairDocs).toDF("doc_id", "text")

    val uncapped = TextQueries.minhashNearDupCore(docs, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val capped = TextQueries.minhashNearDupCore(docs, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()

    // uncapped sees the full clique (C(12,2) pairs) + the planted pair
    assert(uncapped.contains((100L, 101L)))
    assert(uncapped.size == (cap + 4) * (cap + 3) / 2 + 1)
    // capped drops ONLY the oversized clique's pairs
    assert(capped == Set((100L, 101L)))
  }
}
