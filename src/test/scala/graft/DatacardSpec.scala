package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CurationQueries, TextQueries}

/** q130 data card: per-source totals must re-derive from the raw
  * corpus, and the duplicate-exposure column must agree with q23's
  * exact-dedup groups (corpus-wide crediting, not per-source).
  */
class DatacardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("totals and dup exposure re-derive from the corpus") {
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", $"n_chars").as[(Long, String, Long)]
      .collect()
    val dupDocs = TextQueries.exactDedup(spark, dir)
      .filter($"group_size" > 1).select($"doc_id").as[Long].collect().toSet
    val card = CurationQueries.sourceDatacard(spark, dir)
      .select($"source", $"n_docs", $"total_chars", $"mean_chars",
        $"n_dup_docs", $"dup_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect()

    val bySource = docs.groupBy(_._2)
    assert(card.map(_._1).toSeq == bySource.keys.toSeq.sorted, "one row per source")
    card.foreach { case (src, nDocs, totalChars, meanChars, nDup, dupPpm) =>
      val rows = bySource(src)
      assert(nDocs == rows.length, s"$src n_docs")
      assert(totalChars == rows.map(_._3).sum, s"$src total_chars")
      assert(meanChars == totalChars / nDocs, s"$src mean_chars")
      assert(nDup == rows.count(r => dupDocs(r._1)),
        s"$src dup exposure must match q23's corpus-wide groups")
      assert(dupPpm == nDup * 1000000L / nDocs, s"$src dup_ppm encoding")
    }
  }
}
