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
    // PLAN time; it must now be lazy (PlanPurity counts job starts
    // while the whole q24-family DataFrame — plan only — is built)
    val docs = Tables.loadSpread(spark, dir, "documents")
    val jobs = PlanPurity.jobsDuringConstruction(spark) {
      TextQueries.minhashNearDupCore(docs, TextQueries.lshBandMaxDf)
    }
    assert(jobs == 0,
      s"constructing the q24 plan launched $jobs Spark job(s)")
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
