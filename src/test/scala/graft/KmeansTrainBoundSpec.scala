package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries

/** The q97 training-sample bound must be ENFORCED by the code, not
  * asserted by a comment (the r16 finding: a fixed `% 4` modulus is
  * 25% of the corpus at ANY size — 25 TB through the one seeding task
  * at 100 TB). Three layers under test: the derived modulus targets
  * ≤TrainCap expected rows, the orderBy+limit hard cap holds even
  * when the id distribution defeats modulo sampling, and both layers
  * are provably inert at oracle scales (so the DuckDB mirror's
  * `% 4 = 0` stays exact).
  */
class KmeansTrainBoundSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("derived modulus bounds the expected sample at every corpus size") {
    val cap = SimilarityQueries.TrainCap
    // oracle scales: the floor of 4 is what the DuckDB mirror pins
    for (n <- Seq(0L, 100L, 5000L, cap, 4 * cap))
      assert(SimilarityQueries.trainModulus(n) == 4L,
        s"n=$n must keep the oracle-pinned modulus 4")
    // past the floor the modulus must scale so n/m stays <= cap
    for (n <- Seq(4 * cap + 1, 10 * cap, 1000 * cap, 1000000 * cap)) {
      val m = SimilarityQueries.trainModulus(n)
      assert(n / m <= cap, s"n=$n m=$m: expected sample ${n / m} > $cap")
      // and not over-thinned: half the cap is still a real sample
      assert(n / m >= cap / 2, s"n=$n m=$m over-thins to ${n / m}")
    }
  }

  test("hard cap holds on an oversized frame with modulo-adversarial ids") {
    val cap = SimilarityQueries.TrainCap
    // 450k rows > 4*TrainCap, every id divisible by every plausible
    // modulus' worst case: ids are multiples of 2^20, so for m a
    // power-of-two-ish divisor the modulo filter keeps far MORE than
    // n/m — the exact distribution that defeats expected-size
    // sampling and makes the limit layer load-bearing.
    val n = 450000L
    val emb = spark.range(n)
      .selectExpr("id * 1048576 AS vec_id", "array(id, id + 1) AS q")
    val sample = SimilarityQueries.trainingSample(emb, n)
    val got = sample.count()
    assert(got <= cap, s"training sample $got rows > TrainCap $cap")
    assert(got > 0, "sample must not be empty")
    // deterministic: the cap keeps the SMALLEST vec_ids
    val maxId = sample.agg(org.apache.spark.sql.functions.max($"vec_id"))
      .as[Long].collect().head
    val rerun = SimilarityQueries.trainingSample(emb, n).count()
    assert(rerun == got, "hard-capped sample must be deterministic")
    assert(maxId < n * 1048576L, "ids out of the generated domain")
  }

  test("both layers are inert at oracle scales (sf0.01 sample is exactly vec_id % 4 = 0)") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, dir, "embeddings").select($"vec_id")
    val nVec = emb.count()
    val got = SimilarityQueries.trainingSample(emb, nVec)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    val want = emb.filter($"vec_id" % 4 === 0)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(got == want,
      "the enforced bound changed the oracle-scale sample — DuckDB mirror would diverge")
  }
}
