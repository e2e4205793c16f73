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
}
