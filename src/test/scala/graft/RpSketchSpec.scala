package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries

/** q129 random-projection sketch search: the coarse 16-dim sketch must
  * genuinely order the corpus (recall@5 against the q30 exact ground
  * truth above a pinned floor at every driver scale), re-ranked
  * cosines must be bit-identical to the exact scan's for the same
  * (qid, cid), and the output is exactly top-5 per query.
  */
class RpSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recallAt5(dir: String): Double = {
    val truth = SimilarityQueries.knnBruteForce(spark, dir)
      .filter($"rank" <= 5).select($"qid", $"cid").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val got = SimilarityQueries.rpSketchSearch(spark, dir)
      .select($"qid", $"cid").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val per = truth.toSeq.map { case (q, t) =>
      got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  test("sketch recall@5 beats the pinned floor at both driver scales") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val r = recallAt5(dir)
      info(f"$dir recall@5 = $r%.3f")
      assert(r >= 0.40, f"$dir: sketch recall collapsed: $r%.3f")
    }
  }

  test("re-ranked cosines are bit-identical to the exact scan") {
    val dir = "/root/testdata/sf0.001"
    val exact = SimilarityQueries.knnBruteForce(spark, dir)
      .select($"qid", $"cid", $"cos").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val rows = SimilarityQueries.rpSketchSearch(spark, dir)
      .select($"qid", $"cid", $"cos", $"rank").as[(Long, Long, Double, Long)]
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to 5L), s"qid=$qid must emit exactly top-5")
    }
    rows.foreach { case (qid, cid, cos, _) =>
      exact.get((qid, cid)).foreach(e =>
        assert(e == cos, s"($qid,$cid): sketch re-rank cosine differs from exact scan"))
    }
  }
}
