package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries

/** q127 ANN eval: the in-engine recall@5 / MRR report must equal an
  * independent driver-side recomputation from the raw q30/q31 result
  * lists, its integer encodings must be internally consistent, and
  * every query id must appear exactly once (including zero-hit ones —
  * the left join, not an inner join, carries them).
  */
class AnnEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("eval metrics match a driver-side recomputation") {
    val truth = SimilarityQueries.knnBruteForce(spark, dir)
      .filter($"rank" <= 5).select($"qid", $"cid").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val approx = SimilarityQueries.annLshBuckets(spark, dir)
      .select($"qid", $"cid", $"rank").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    val eval = SimilarityQueries.annRecallEval(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()

    assert(eval.map(_._1).toSeq == truth.keys.toSeq.sorted,
      "one row per ground-truth qid, in qid order")
    eval.foreach { case (qid, hits, recallPpm, firstHit, mrrPpm) =>
      val t = truth(qid)
      val a = approx.getOrElse(qid, Array.empty[(Long, Long, Long)])
      val hitRanks = a.filter(r => t.contains(r._2)).map(_._3)
      assert(hits == hitRanks.length, s"qid=$qid hits")
      assert(recallPpm == hits * 1000000L / 5, s"qid=$qid recall encoding")
      assert(firstHit == (if (hitRanks.isEmpty) 0L else hitRanks.min), s"qid=$qid first hit")
      assert(mrrPpm == (if (hitRanks.isEmpty) 0L else 1000000L / hitRanks.min),
        s"qid=$qid mrr encoding")
    }
    // the fixture must exercise the metric, not degenerate to all-zero
    assert(eval.map(_._2).sum > 0, "LSH index found no true neighbors at all")
  }

  test("nDCG@5 matches a driver-side recomputation with the shared literals") {
    val disc = Seq(1000000000L, 630929753L, 500000000L, 430676558L, 386852807L)
    val idcg = 4L * disc(0) + 3L * (disc(1) + disc(2)) + 2L * (disc(3) + disc(4))
    val grades = SimilarityQueries.knnBruteForce(spark, dir)
      .filter($"rank" <= 10).select($"qid", $"cid", $"rank")
      .as[(Long, Long, Long)].collect()
      .map { case (q, c, r) =>
        (q, c) -> (if (r == 1) 4L else if (r <= 3) 3L else if (r <= 6) 2L else 1L)
      }.toMap
    val approx = SimilarityQueries.annLshBuckets(spark, dir)
      .filter($"rank" <= 5).select($"qid", $"cid", $"rank")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val eval = SimilarityQueries.ndcgEval(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(eval.map(_._1).toSeq == grades.keys.map(_._1).toSeq.distinct.sorted)
    eval.foreach { case (qid, dcgFx, ndcgPpm) =>
      val a = approx.getOrElse(qid, Array.empty[(Long, Long, Long)])
      val expect = a.map { case (q, c, r) =>
        grades.getOrElse((q, c), 0L) * disc(r.toInt - 1)
      }.sum
      assert(dcgFx == expect, s"qid=$qid dcg")
      assert(ndcgPpm == dcgFx * 1000000L / idcg, s"qid=$qid ndcg encoding")
      assert(ndcgPpm >= 0 && ndcgPpm <= 1000000L, s"qid=$qid ndcg bounds")
    }
    assert(eval.map(_._2).sum > 0, "nDCG degenerate: no graded hit anywhere")
  }
}
