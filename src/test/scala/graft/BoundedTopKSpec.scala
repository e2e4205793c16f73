package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BoundedTopK.boundedTopK
import graft.queries.{OlapQueries, SimilarityQueries}

/** [[graft.plans.BoundedTopK]] — the scale-correct top-k-per-group:
  * result equivalence against the window-function definition, bounded
  * partial state under any partitioning, and the plan contract that no
  * query-path top-k routes through a low-cardinality window anymore.
  */
class BoundedTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Deterministic skewed fixture: 3 groups, value collisions (ties)
    * on purpose, arbitrary partitioning.
    */
  private def fixture(parts: Int) = spark.range(0, 1000)
    .select(($"id" % 3).as("g"), ($"id" % 97).cast("double").as("v"), $"id")
    .repartition(parts)

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    fixture(7).withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"g", $"id", $"v", $"rank")
  }

  private def viaTopK(k: Int, parts: Int) = fixture(parts)
    .groupBy($"g")
    .agg(boundedTopK(struct((-$"v").as("nv"), $"id", $"v"), k).as("top"))
    .select($"g", posexplode($"top").as(Seq("pos", "r")))
    .select($"g", $"r.id".as("id"), $"r.v".as("v"),
      ($"pos" + 1).cast("long").as("rank"))

  test("equals the row_number window definition, ties broken identically") {
    for (k <- Seq(1, 3, 10)) {
      val w = viaWindow(k)
      val t = viaTopK(k, 7)
      assert(t.count() == w.count())
      assert(t.except(w).count() == 0, s"k=$k extra rows")
      assert(w.except(t).count() == 0, s"k=$k missing rows")
    }
  }

  test("partitioning-invariant (merge path exercised)") {
    val one = viaTopK(3, 1).orderBy($"g", $"rank").collect().toSeq
    val many = viaTopK(3, 32).orderBy($"g", $"rank").collect().toSeq
    assert(one == many)
  }

  test("groups smaller than k return all rows, ascending rank") {
    val few = spark.range(0, 4)
      .select(($"id" % 2).as("g"), $"id".cast("double").as("v"), $"id")
      .groupBy($"g")
      .agg(boundedTopK(struct((-$"v").as("nv"), $"id"), 10).as("top"))
      .select($"g", size($"top").as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(few == Map(0L -> 2, 1L -> 2))
  }

  test("q59/q30/q31/q33: no Window operator; aggregation-based top-k") {
    val plans = Seq(
      OlapQueries.topPerSegment(spark, dir),
      SimilarityQueries.knnBruteForce(spark, dir),
      SimilarityQueries.annLshBuckets(spark, dir),
      SimilarityQueries.ivfSearch(spark, dir))
    for (df <- plans) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"),
        "top-k must not funnel groups through a window sort:\n" + p.take(400))
      assert(p.contains("ObjectHashAggregate"),
        "bounded top-k should plan as ObjectHashAggregate:\n" + p.take(400))
    }
  }

  test("q80 multi-probe IVF recall dominates single-probe (superset candidates)") {
    // probing 2 clusters can only ADD candidates, so for every query
    // the rank-i cosine under multi-probe is >= the rank-i cosine
    // under single-probe — the recall/cost knob moves one way.
    def top(df: org.apache.spark.sql.DataFrame) = df
      .select($"qid", $"rank", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val single = top(SimilarityQueries.ivfSearch(spark, dir))
    val multi = top(SimilarityQueries.ivfMultiProbe(spark, dir))
    assert(single.nonEmpty)
    for (((qid, rank), cosSingle) <- single; cosMulti <- multi.get((qid, rank)))
      assert(cosMulti >= cosSingle - 1e-12,
        s"qid=$qid rank=$rank multi=$cosMulti < single=$cosSingle")
  }

  test("boundedRankTopK column API: tie groups kept, ranks precomputed") {
    import graft.plans.BoundedRankTopK.boundedRankTopK
    val df = Seq(("a", 1.0, "x"), ("a", 1.0, "y"), ("a", 2.0, "z"),
        ("b", 5.0, "w"))
      .toDF("g", "k", "p").repartition(3)
    val out = df.groupBy($"g")
      .agg(boundedRankTopK(struct($"k", $"p"), 1, 1).as("t"))
      .select($"g", explode($"t").as("e"))
      .select($"g", $"e.r".as("r"), $"e.k".as("k"), $"e.p".as("p"))
      .as[(String, Int, Double, String)].collect().toSet
    // k=1 with a tie at the head: BOTH 1.0 rows share rank 1; 2.0 out.
    assert(out == Set(("a", 1, 1.0, "x"), ("a", 1, 1.0, "y"), ("b", 1, 5.0, "w")))

    val dense = df.groupBy($"g")
      .agg(boundedRankTopK(struct($"k", $"p"), 2, 1, dense = true).as("t"))
      .select($"g", explode($"t").as("e"))
      .select($"g", $"e.r".as("r"), $"e.p".as("p"))
      .as[(String, Int, String)].collect().toSet
    // dense k=2 keeps both distinct key values of group a
    assert(dense == Set(("a", 1, "x"), ("a", 1, "y"), ("a", 2, "z"),
      ("b", 1, "w")))
  }

  test("q34 banded LSH finds exactly the planted near-dup pairs") {
    // Recall invariance of the 3×8-plane OR-construction: the planted
    // (v, v+1000000) perturbed copies — and nothing else — survive the
    // cos >= 0.99 verify, so widening the signature kept recall 1.0.
    val emb = Tables.loadSpread(spark, dir, "embeddings")
    val planted = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("i"), ($"vec_id" + 1000000L).as("j"))
      .orderBy($"i").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val found = SimilarityQueries.cosineNearDup(spark, dir)
      .select($"i", $"j").orderBy($"i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(found == planted)
  }
}
