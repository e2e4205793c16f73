package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RewriteRankLimitToBoundedTopK

/** The optimizer rule that rewrites `row_number() <= k` window
  * filters into the BoundedTopK aggregate. Installed here via
  * `spark.experimental.extraOptimizations` (the running test session
  * can't be rebuilt with extensions); `GraftExtensions` installs the
  * same object via `injectOptimizerRule` for cluster sessions.
  */
class TopKRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteRankLimitToBoundedTopK
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteRankLimitToBoundedTopK)
  }

  private val rows = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
    ("b", 5L, 5.0), ("b", 6L, 15.0),
    ("c", 7L, 1.0))

  // Decimal sort key, descending; cast-derived decimals are nullable
  // in Spark, which the per-field-direction aggregate handles natively.
  private def idiom(k: Int): DataFrame =
    rows.toDF("seg", "id", "price")
      .withColumn("price", $"price".cast("decimal(10,2)"))
      .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"price".desc)))
      .filter($"rn" <= k)

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case w: Window => w }.nonEmpty

  test("rewrites desc-decimal top-k: no Window left, BoundedTopK in plan") {
    withRule {
      val df = idiom(2)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      assert(df.queryExecution.optimizedPlan.treeString.contains("bounded_top_k"))
    }
  }

  test("rewritten result equals the window result (unique order keys)") {
    val expected = idiom(2).select("seg", "id", "price", "rn")
      .as[(String, Long, BigDecimal, Int)].collect().toSet
    val got = withRule {
      idiom(2).select("seg", "id", "price", "rn")
        .as[(String, Long, BigDecimal, Int)].collect().toSet
    }
    assert(got == expected)
    assert(got.map { case (s, i, p, r) => (s, i, p.toDouble, r) } == Set(
      ("a", 4L, 40.0, 1), ("a", 2L, 30.0, 2),
      ("b", 6L, 15.0, 1), ("b", 5L, 5.0, 2),
      ("c", 7L, 1.0, 1)))
  }

  test("desc double rewrites: NaN row keeps its window rank") {
    withRule {
      // NaN sorts greatest under BOTH sort directions in Spark; the
      // aggregate compares via the same SortOrder semantics the window
      // sort uses (no negation), so the NaN row must still rank first.
      val df = Seq(("a", 1L, Double.NaN), ("a", 2L, 30.0), ("a", 3L, 20.0))
        .toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"price".desc)))
        .filter($"rn" <= 1)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      val top = df.select("id").as[Long].collect().toSeq
      assert(top == Seq(1L), s"NaN row must rank first under desc, got ids $top")
    }
  }

  test("desc long rewrites: Long.MinValue keeps its window rank") {
    withRule {
      // No negation in the comparator, so Long.MinValue can't wrap
      // (non-ANSI) or throw (ANSI): it must rank LAST under desc.
      val df = Seq(("a", 1L, Long.MinValue), ("a", 2L, 5L), ("a", 3L, -3L))
        .toDF("seg", "id", "v")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"v".desc)))
        .filter($"rn" <= 1)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      assert(df.select("id").as[Long].collect().toSeq == Seq(2L))
    }
  }

  test("desc key with nulls: NULLS LAST placement matches the window") {
    withRule {
      val df = Seq(("a", 1L, Some(3.0)), ("a", 2L, None), ("a", 3L, Some(7.0)))
        .toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"price".desc)))
        .filter($"rn" <= 2)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      // desc = NULLS LAST by default: 7.0, 3.0, then the null row.
      assert(df.select("id", "rn").as[(Long, Int)].collect().toSet ==
        Set((3L, 1), (1L, 2)))
    }
  }

  test("non-default null placement rewrites (desc_nulls_first)") {
    withRule {
      val df = Seq(("a", 1L, Some(3.0)), ("a", 2L, None))
        .toDF("seg", "id", "price")
        .withColumn("rn",
          row_number().over(W.partitionBy($"seg").orderBy($"price".desc_nulls_first)))
        .filter($"rn" <= 1)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      assert(df.select("id").as[Long].collect().toSeq == Seq(2L))
    }
  }

  test("non-default null placement rewrites (asc_nulls_last, both orders)") {
    withRule {
      val data = Seq(("a", 1L, Some(3.0)), ("a", 2L, None), ("a", 3L, Some(1.0)))
      val ascLast = data.toDF("seg", "id", "price")
        .withColumn("rn",
          row_number().over(W.partitionBy($"seg").orderBy($"price".asc_nulls_last)))
        .filter($"rn" <= 2)
      assert(!hasWindow(ascLast), ascLast.queryExecution.optimizedPlan.treeString)
      // nulls pushed behind the values: 1.0 rn=1, 3.0 rn=2, null rn=3 (out)
      assert(ascLast.select("id", "rn").as[(Long, Int)].collect().toSet ==
        Set((3L, 1), (1L, 2)))
      // mixed placements across two keys in one window
      val mixed = data.toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(
          W.partitionBy($"seg").orderBy($"price".desc_nulls_first, $"id".asc)))
        .filter($"rn" <= 1)
      assert(!hasWindow(mixed), mixed.queryExecution.optimizedPlan.treeString)
      assert(mixed.select("id").as[Long].collect().toSeq == Seq(2L))
    }
  }

  test("rn = 1 argmax form rewrites and downstream projection still works") {
    withRule {
      val df = rows.toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"price")))
        .filter($"rn" === 1)
        .select($"seg", $"price")
      assert(!hasWindow(df))
      assert(df.as[(String, Double)].collect().toSet ==
        Set(("a", 10.0), ("b", 5.0), ("c", 1.0)))
    }
  }

  test("ascending and descending string keys both rewrite") {
    withRule {
      val asc = rows.toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"id")))
        .filter($"rn" <= 1)
      assert(!hasWindow(asc))

      // desc on a string column has no arithmetic trick at all — the
      // per-field SortOrder comparator is the only way to express it,
      // and it must agree with the window.
      val descStr = Seq(("a", "x"), ("a", "y")).toDF("seg", "name")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"name".desc)))
        .filter($"rn" <= 1)
      assert(!hasWindow(descStr), descStr.queryExecution.optimizedPlan.treeString)
      assert(descStr.select("name").as[String].collect().toSeq == Seq("y"))
    }
  }

  test("mixed-direction keys rewrite and match the window ranks") {
    val base = Seq(
      ("a", 1L, 10.0, "u"), ("a", 2L, 10.0, "v"), ("a", 3L, 5.0, "w"),
      ("b", 4L, 1.0, "z"))
    def mixed(ruleOn: Boolean): Set[(String, Long, Int)] = {
      val run = () => {
        val df = base.toDF("seg", "id", "price", "name")
          .withColumn("rn", row_number().over(
            W.partitionBy($"seg").orderBy($"price".desc, $"name".asc)))
          .filter($"rn" <= 2)
        if (ruleOn) assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
        df.select("seg", "id", "rn").as[(String, Long, Int)].collect().toSet
      }
      if (ruleOn) withRule(run()) else run()
    }
    val expected = mixed(ruleOn = false)
    assert(mixed(ruleOn = true) == expected)
    assert(expected == Set(("a", 1L, 1), ("a", 2L, 2), ("b", 4L, 1)))
  }

  test("bigint literal bound rewrites (cast(rn AS bigint) <= 2L)") {
    withRule {
      val df = rows.toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"price")))
        .filter($"rn" <= lit(2L))
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      assert(df.select("seg", "id").as[(String, Long)].collect().toSet ==
        Set(("a", 1L), ("a", 3L), ("b", 5L), ("b", 6L), ("c", 7L)))
    }
  }

  // Ties on price within segment "a": rank() must keep BOTH tied rows
  // and assign them the same rank; the tie-aware aggregate keeps whole
  // key groups, so the boundary group survives intact.
  private val tied = Seq(
    ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 5.0), ("b", 7L, 9.0))

  test("rank() <= k rewrites with ties kept and window-identical ranks") {
    def run(ruleOn: Boolean): Set[(String, Long, Int)] = {
      val go = () => {
        val df = tied.toDF("seg", "id", "price").repartition(4)
          .withColumn("r", rank().over(W.partitionBy($"seg").orderBy($"price")))
          .filter($"r" <= 2)
        if (ruleOn) {
          assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
          assert(df.queryExecution.optimizedPlan.treeString.contains("bounded_rank_top_k"))
        }
        df.select("seg", "id", "r").as[(String, Long, Int)].collect().toSet
      }
      if (ruleOn) withRule(go()) else go()
    }
    val expected = run(ruleOn = false)
    assert(run(ruleOn = true) == expected)
    // seg a: ids 1,2 tie at rank 1 — rank 2 is skipped, so NOTHING else
    // qualifies under r <= 2; seg b: 5,6 tie at 1, id 7 is rank 3 (out).
    assert(expected == Set(
      ("a", 1L, 1), ("a", 2L, 1),
      ("b", 5L, 1), ("b", 6L, 1)))
  }

  test("rank() = 1 keeps the whole tied head group") {
    withRule {
      val df = tied.toDF("seg", "id", "price").repartition(3)
        .withColumn("r", rank().over(W.partitionBy($"seg").orderBy($"price".desc)))
        .filter($"r" === 1)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      assert(df.select("seg", "id").as[(String, Long)].collect().toSet ==
        Set(("a", 4L), ("b", 7L)))
    }
  }

  test("dense_rank() <= k rewrites: k distinct key values, ties kept") {
    def run(ruleOn: Boolean): Set[(String, Long, Int)] = {
      val go = () => {
        val df = tied.toDF("seg", "id", "price").repartition(4)
          .withColumn("r", dense_rank().over(W.partitionBy($"seg").orderBy($"price")))
          .filter($"r" <= 2)
        if (ruleOn) assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
        df.select("seg", "id", "r").as[(String, Long, Int)].collect().toSet
      }
      if (ruleOn) withRule(go()) else go()
    }
    val expected = run(ruleOn = false)
    assert(run(ruleOn = true) == expected)
    // dense_rank does NOT skip after ties: seg a keeps 10.0 (r=1, two
    // rows) and 20.0 (r=2); seg b keeps 5.0 (r=1, two rows) and 9.0.
    assert(expected == Set(
      ("a", 1L, 1), ("a", 2L, 1), ("a", 3L, 2),
      ("b", 5L, 1), ("b", 6L, 1), ("b", 7L, 2)))
  }

  test("rank() with an oversized head tie group keeps it all (r=1 only)") {
    withRule {
      // 5 rows tie at the minimum with k=3: all share rank 1; the next
      // key's rank is 6 > 3, so exactly the tie group survives.
      val df = (Seq.tabulate(5)(i => ("a", i.toLong, 1.0)) ++
          Seq(("a", 90L, 2.0), ("a", 91L, 3.0)))
        .toDF("seg", "id", "price").repartition(4)
        .withColumn("r", rank().over(W.partitionBy($"seg").orderBy($"price")))
        .filter($"r" <= 3)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      assert(df.select("id", "r").as[(Long, Int)].collect().toSet ==
        (0L until 5L).map(i => (i, 1)).toSet)
    }
  }

  test("rank() with non-default null placement rewrites, ties kept") {
    withRule {
      val df = Seq(("a", 1L, Some(3.0)), ("a", 2L, None), ("a", 3L, None))
        .toDF("seg", "id", "price").repartition(3)
        .withColumn("r", rank().over(
          W.partitionBy($"seg").orderBy($"price".asc_nulls_last)))
        .filter($"r" <= 1)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      // asc NULLS LAST: 3.0 is rank 1; the null tie pair shares rank 2.
      assert(df.select("id").as[Long].collect().toSeq == Seq(1L))
    }
  }

  test("rank() over null keys: tied nulls share a rank, default placement") {
    withRule {
      // asc NULLS FIRST (the default): the two null rows tie at rank 1,
      // 3.0 is rank 3 — so r <= 2 keeps exactly the null pair.
      val df = Seq(("a", 1L, Some(3.0)), ("a", 2L, None), ("a", 3L, None))
        .toDF("seg", "id", "price").repartition(3)
        .withColumn("r", rank().over(W.partitionBy($"seg").orderBy($"price")))
        .filter($"r" <= 2)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      assert(df.select("id", "r").as[(Long, Int)].collect().toSet ==
        Set((2L, 1), (3L, 1)))
    }
  }

  test("dense_rank() desc with nulls: NULLS LAST group counts as one rank") {
    withRule {
      val df = Seq(("a", 1L, Some(3.0)), ("a", 2L, None), ("a", 3L, None),
          ("a", 4L, Some(7.0)))
        .toDF("seg", "id", "price").repartition(3)
        .withColumn("r", dense_rank().over(W.partitionBy($"seg").orderBy($"price".desc)))
        .filter($"r" <= 3)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      // desc NULLS LAST: 7.0 r=1, 3.0 r=2, the null pair shares r=3.
      assert(df.select("id", "r").as[(Long, Int)].collect().toSet ==
        Set((4L, 1), (1L, 2), (2L, 3), (3L, 3)))
    }
  }

  test("SQL window idiom rewrites (subquery + WHERE r <= 2)") {
    withRule {
      tied.toDF("seg", "id", "price").createOrReplaceTempView("t_topk_sql")
      val df = spark.sql(
        """SELECT seg, id, r FROM (
          |  SELECT seg, id,
          |    rank() OVER (PARTITION BY seg ORDER BY price DESC) AS r
          |  FROM t_topk_sql)
          |WHERE r <= 2""".stripMargin)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      // desc: seg a: 30.0 r=1, 20.0 r=2 (the 10.0 tie pair is r=3, out);
      // seg b: 9.0 r=1, then the 5.0 pair ties at r=2.
      assert(df.as[(String, Long, Int)].collect().toSet == Set(
        ("a", 4L, 1), ("a", 3L, 2),
        ("b", 7L, 1), ("b", 5L, 2), ("b", 6L, 2)))
    }
  }

  test("residual conjuncts survive: rn <= 2 AND price > 5 rewrites") {
    def run(ruleOn: Boolean): Set[(String, Long, Int)] = {
      val go = () => {
        val df = rows.toDF("seg", "id", "price")
          .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"price")))
          .filter($"rn" <= 2 && $"price" > 5.0)
        if (ruleOn) assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
        df.select("seg", "id", "rn").as[(String, Long, Int)].collect().toSet
      }
      if (ruleOn) withRule(go()) else go()
    }
    val expected = run(ruleOn = false)
    assert(run(ruleOn = true) == expected)
    // The residual prunes AFTER ranking: seg b keeps only id 6
    // (15.0 > 5, rank 2); id 5's price 5.0 fails the residual but its
    // rank-1 slot is NOT reassigned. seg c's 1.0 fails entirely.
    assert(expected == Set(("a", 1L, 1), ("a", 3L, 2), ("b", 6L, 2)))
  }

  test("two rank bounds: the tightest wins, looser is consumed") {
    withRule {
      val df = rows.toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"price")))
        .filter($"rn" <= 5 && $"rn" <= 1)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      assert(df.select("seg", "id").as[(String, Long)].collect().toSet ==
        Set(("a", 1L), ("b", 5L), ("c", 7L)))
    }
  }

  test("rn = c for c > 1: bounds the aggregate at c, equality kept as residual") {
    withRule {
      val df = rows.toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"price")))
        .filter($"rn" === 2)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      // exactly the second-cheapest per segment; seg c has no rank 2
      assert(df.select("seg", "id").as[(String, Long)].collect().toSet ==
        Set(("a", 3L), ("b", 6L)))
    }
  }

  test("rank() = c with a tied group at rank c keeps the whole group") {
    withRule {
      val df = tied.toDF("seg", "id", "price").repartition(3)
        .withColumn("r", rank().over(W.partitionBy($"seg").orderBy($"price".desc)))
        .filter($"r" === 2)
      assert(!hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      // seg a desc: 30(r1), 20(r2), 10,10(r3) → id 3; seg b desc:
      // 9(r1), then 5.0 ties BOTH at r2 → ids 5 and 6 both kept.
      assert(df.select("seg", "id").as[(String, Long)].collect().toSet ==
        Set(("a", 3L), ("b", 5L), ("b", 6L)))
    }
  }

  test("randomized parity: all three rank functions match the window") {
    // Heavy ties on purpose: 8 distinct prices over 400 rows in 4
    // segments, so every boundary case (tie at k, tie group spanning
    // partial-aggregation partitions) occurs. Seeded → reproducible.
    val rnd = new scala.util.Random(42)
    val data = Seq.tabulate(400)(i =>
      (s"s${rnd.nextInt(4)}", i.toLong, rnd.nextInt(8).toDouble))
    def run(fn: String, k: Int, ruleOn: Boolean): Set[(String, Long, Double, Int)] = {
      val go = () => {
        val c = fn match {
          case "rank" => rank()
          case "dense_rank" => dense_rank()
          case _ => row_number()
        }
        // rank/dense_rank order by price alone so ties actually occur;
        // row_number needs the unique id tie-break or its selection
        // among tied rows is arbitrary and the parity check ill-posed.
        val order = if (fn == "row_number") Seq($"price".desc, $"id".asc)
          else Seq($"price".desc)
        val df = data.toDF("seg", "id", "price").repartition(7)
          .withColumn("r", c.over(W.partitionBy($"seg").orderBy(order: _*)))
          .filter($"r" <= k)
        if (ruleOn) assert(!hasWindow(df), s"$fn k=$k kept its Window")
        df.select("seg", "id", "price", "r")
          .as[(String, Long, Double, Int)].collect().toSet
      }
      if (ruleOn) withRule(go()) else go()
    }
    for (fn <- Seq("rank", "dense_rank", "row_number"); k <- Seq(1, 3, 7)) {
      val expected = run(fn, k, ruleOn = false)
      val got = run(fn, k, ruleOn = true)
      assert(got == expected, s"$fn k=$k: rewrite diverged from window")
    }
  }

  test("randomized parity: all four null placements match the window") {
    // ~25% null keys so null groups hit every boundary; ties via 6
    // distinct prices. Every direction/placement combination must
    // produce window-identical rows — none stand down any more.
    val rnd = new scala.util.Random(7)
    val data = Seq.tabulate(300)(i => (s"s${rnd.nextInt(3)}", i.toLong,
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(6).toDouble)))
    val orders = Seq[(String, org.apache.spark.sql.Column)](
      ("asc_nulls_first", $"price".asc_nulls_first),
      ("asc_nulls_last", $"price".asc_nulls_last),
      ("desc_nulls_first", $"price".desc_nulls_first),
      ("desc_nulls_last", $"price".desc_nulls_last))
    def run(fn: String, ord: org.apache.spark.sql.Column,
        ruleOn: Boolean): Set[(String, Long, Int)] = {
      val go = () => {
        val c = if (fn == "rank") rank() else dense_rank()
        val df = data.toDF("seg", "id", "price").repartition(5)
          .withColumn("r", c.over(W.partitionBy($"seg").orderBy(ord)))
          .filter($"r" <= 3)
        if (ruleOn) assert(!hasWindow(df), s"$fn kept its Window")
        df.select("seg", "id", "r").as[(String, Long, Int)].collect().toSet
      }
      if (ruleOn) withRule(go()) else go()
    }
    for (fn <- Seq("rank", "dense_rank"); (name, ord) <- orders) {
      val expected = run(fn, ord, ruleOn = false)
      val got = run(fn, ord, ruleOn = true)
      assert(got == expected, s"$fn over $name: rewrite diverged from window")
    }
  }
}
