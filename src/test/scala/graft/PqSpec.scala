package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries

/** Product-quantization ADC search (q123) contracts: the 64×
  * compression must keep useful recall against the exact brute-force
  * truth, and the search plan must stay one corpus scan (queries
  * broadcast, no cross product). Value-level parity with DuckDB is the
  * driver gate's job.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recallAt10(dir: String): Double = {
    val truth = SimilarityQueries.knnBruteForce(spark, dir)
      .select($"qid", $"cid").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val got = SimilarityQueries.pqAdcSearch(spark, dir)
      .select($"qid", $"cid").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val per = truth.toSeq.map { case (q, t) =>
      got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  test("q123: ADC recall@10 vs exact cosine truth stays useful at 64x compression") {
    // embeddings are unit-norm (asserted below), so exact-L2 and
    // exact-cosine rankings coincide; all recall loss is quantization
    // error. The floor is deliberately conservative — the point of the
    // assert is catching a silently BROKEN codebook (recall ~ k/n),
    // not pinning a noisy decimal.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // measured 0.57 / 0.59 (sf0.001 / sf0.01) — synthetic unit-norm
      // vectors are near-orthogonal (no cluster structure), the
      // hardest case for PQ; the floor distinguishes a broken
      // codebook (recall ≈ k/n ≈ 0.02) from a working one.
      val r = recallAt10(dir)
      info(f"$dir PQ recall@10 = $r%.3f")
      assert(r >= 0.40, f"$dir: PQ recall collapsed: $r%.3f")
    }
  }

  test("q123: codes quantize the corpus (not constant, not degenerate)") {
    val out = SimilarityQueries.pqAdcSearch(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // adist must be non-negative and non-constant across candidates
    val adists = out.map(_.getLong(2))
    assert(adists.forall(_ >= 0L))
    assert(adists.distinct.length > 1, "all ADC distances equal — dead codebook")
    // the unit-norm premise the recall test relies on
    val norms = Tables.loadSpread(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("sqrt(aggregate(transform(embedding, x -> cast(x as double) * x), 0d, (a, v) -> a + v)) as n")
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3), "embeddings not unit-norm")
  }

  test("q123 plan: one corpus scan — queries broadcast, no cartesian product") {
    val p = SimilarityQueries.pqAdcSearch(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(300))
    assert(p.contains("Broadcast"), p.take(300))
  }
}
