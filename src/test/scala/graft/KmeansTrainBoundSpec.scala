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
    // 450k rows > 4*TrainCap with EVERY id a multiple of the derived
    // modulus (trainModulus(450000) = 5; ids are 5·i), so the modulo
    // filter keeps ALL 450k rows — the distribution that defeats
    // expected-size sampling outright and makes the orderBy+limit
    // layer load-bearing. (The first version of this fixture used
    // 2^20·i ids, but 2^20 ≡ 1 (mod 5), so the filter silently kept
    // exactly n/5 and the limit never bound — caught in review.)
    val n = 450000L
    val m = SimilarityQueries.trainModulus(n)
    val emb = spark.range(n)
      .selectExpr(s"id * $m AS vec_id", "array(id, id + 1) AS q")
    // prove the adversarial premise: the modulo layer alone is blown
    val preLimit = emb.filter(org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.lit(m)) === 0).count()
    assert(preLimit == n, s"fixture must defeat the modulo filter (kept $preLimit of $n)")
    val sample = SimilarityQueries.trainingSample(emb, n)
    val got = sample.count()
    assert(got == cap, s"hard cap must bind exactly: got $got, cap $cap")
    // deterministic: the cap keeps exactly the SMALLEST vec_ids
    val maxId = sample.agg(org.apache.spark.sql.functions.max($"vec_id"))
      .as[Long].collect().head
    val rerun = SimilarityQueries.trainingSample(emb, n).count()
    assert(rerun == got, "hard-capped sample must be deterministic")
    assert(maxId == (cap - 1) * m,
      s"cap must keep the smallest ids: max $maxId != ${(cap - 1) * m}")
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
