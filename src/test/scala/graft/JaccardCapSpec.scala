package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** The q25 hot-shingle cap is a candidate-generation bound only:
  * verification recomputes exact intersections, so the default cap
  * must not change a single pair on the corpus, while an absurdly
  * tiny cap may only LOSE pairs (never invent or corrupt one).
  */
class JaccardCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def rows(maxDf: Int): Seq[(String, Long, Long, Double)] =
    TextQueries.jaccardPairsCapped(spark, dir, maxDf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  test("default df cap leaves the corpus result invariant") {
    val uncapped = rows(Int.MaxValue)
    assert(uncapped.nonEmpty) // corpus has planted near-dups
    assert(rows(TextQueries.jaccardMaxDf) == uncapped)
  }

  test("a tiny df cap only drops pairs, never alters surviving ones") {
    val uncapped = rows(Int.MaxValue).toSet
    val tiny = rows(1)
    assert(tiny.size <= uncapped.size)
    assert(tiny.forall(uncapped)) // survivors identical, never corrupted
    assert(rows(0).isEmpty) // no postings -> no candidates
  }

  test("plan construction is pure: building the q25 frame launches zero jobs") {
    // the hot-shingle exclusion used to probe `limit(1).count()` at
    // PLAN time; the anti-join + add-back are now unconditionally in
    // the plan (the coolBanded discipline) — PlanPurity counts job
    // starts while the whole q25 DataFrame (plan only) is built
    val docs = Tables.loadSpread(spark, dir, "documents")
    val jobs = PlanPurity.jobsDuringConstruction(spark) {
      TextQueries.jaccardPairsCappedCore(docs, TextQueries.jaccardMaxDf)
    }
    assert(jobs == 0,
      s"constructing the q25 plan launched $jobs Spark job(s)")
  }
}
