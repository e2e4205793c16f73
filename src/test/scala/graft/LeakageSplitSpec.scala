package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** q102's contract is the INVARIANT, not just the hash values: no
  * verified near-dup pair may straddle a fold boundary (the
  * eval-contamination hole a per-document split leaves open), and the
  * split must still be the q104 fold geometry for unclustered docs.
  */
class LeakageSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("no verified near-dup pair straddles a fold; clusters move as units") {
    val split = TextQueries.leakageSafeSplit(spark, dir)
      .select($"doc_id", $"canonical_id", $"is_clustered", $"split")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getString(3)))
      .toMap
    spark.catalog.clearCache()
    val pairs = TextQueries.minhashNearDup(spark, dir)
      .select($"i", $"j").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    assert(pairs.nonEmpty) // corpus has planted near-dups

    // the leakage invariant: every verified pair shares a fold AND a
    // canonical id (the cluster is one unit)
    pairs.foreach { case (i, j) =>
      assert(split(i)._3 == split(j)._3, s"pair ($i,$j) straddles folds")
      assert(split(i)._1 == split(j)._1, s"pair ($i,$j) split canonicals")
      assert(split(i)._2 && split(j)._2) // both flagged clustered
    }

    // unclustered docs keep the exact q104 geometry: canonical = self
    val solo = split.filter { case (id, (canon, clustered, _)) => !clustered }
    assert(solo.nonEmpty)
    solo.foreach { case (id, (canon, _, _)) => assert(canon == id) }

    // all three folds exist and train dominates (q104's ~90/5/5 ranges)
    val byFold = split.values.groupBy(_._3).view.mapValues(_.size).toMap
    assert(byFold.keySet == Set("train", "val", "test"))
    assert(byFold("train") > byFold("val") && byFold("train") > byFold("test"))
  }

  test("an exact-copy clique larger than the band cap still moves as one unit") {
    // every band bucket the clique occupies exceeds the cap, so q24
    // generates NO pairs for it — the exact-md5 star edges are what
    // must chain it to one canonical (the advice-flagged blind spot)
    val cap = 8
    val clique = (0 until cap + 4).map(i =>
      (i.toLong, "terms of service apply to all content on this site today"))
    val others = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "the quick brown fox jumps over the lazy dog again and once"),
      (200L, "a completely unrelated document about distributed query engines"))
    val docs = (clique ++ others).toDF("doc_id", "text")
    val split = TextQueries.leakageSafeSplitCore(docs, cap)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3)))
      .toMap
    spark.catalog.clearCache()
    // the whole clique: one canonical (its min id), one fold
    assert((0 until cap + 4).map(i => split(i.toLong)).toSet.size == 1)
    assert(split(0L)._1 == 0L)
    // the sub-cap near-dup pair still moves together
    assert(split(100L) == split(101L))
    // the unrelated doc keeps the per-document geometry
    assert(split(200L)._1 == 200L)
  }
}
