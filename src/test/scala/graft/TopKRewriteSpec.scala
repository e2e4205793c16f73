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

  // Decimal sort key: the only numeric type whose negation is exact,
  // so the only one the descending rewrite path may touch.
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

  test("desc double stands down: NaN row keeps its window rank") {
    withRule {
      // NaN sorts greatest under BOTH sort directions in Spark, so a
      // negation-based rewrite would demote the window's rank-1 row to
      // last and silently drop it. The rule must not touch this plan.
      val df = Seq(("a", 1L, Double.NaN), ("a", 2L, 30.0), ("a", 3L, 20.0))
        .toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"price".desc)))
        .filter($"rn" <= 1)
      assert(hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      val top = df.select("id").as[Long].collect().toSeq
      assert(top == Seq(1L), s"NaN row must rank first under desc, got ids $top")
    }
  }

  test("desc long stands down: Long.MinValue keeps its window rank") {
    withRule {
      // -Long.MinValue wraps to Long.MinValue under non-ANSI negation
      // (and throws under ANSI), so the rewrite would wrongly promote
      // it to rank 1. The rule must not touch integral desc keys.
      val df = Seq(("a", 1L, Long.MinValue), ("a", 2L, 5L), ("a", 3L, -3L))
        .toDF("seg", "id", "v")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"v".desc)))
        .filter($"rn" <= 1)
      assert(hasWindow(df), df.queryExecution.optimizedPlan.treeString)
      assert(df.select("id").as[Long].collect().toSeq == Seq(2L))
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

  test("ascending string keys rewrite; nullable desc string keys do not") {
    withRule {
      val asc = rows.toDF("seg", "id", "price")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"id")))
        .filter($"rn" <= 1)
      assert(!hasWindow(asc))

      // desc on a string column can't be expressed by negation → rule
      // must stand down, window plan preserved, result still correct.
      val descStr = Seq(("a", "x"), ("a", "y")).toDF("seg", "name")
        .withColumn("rn", row_number().over(W.partitionBy($"seg").orderBy($"name".desc)))
        .filter($"rn" <= 1)
      assert(hasWindow(descStr))
      assert(descStr.select("name").as[String].collect().toSeq == Seq("y"))
    }
  }

  test("rank() filters are not touched") {
    withRule {
      val df = rows.toDF("seg", "id", "price")
        .withColumn("r", rank().over(W.partitionBy($"seg").orderBy($"price")))
        .filter($"r" <= 2)
      assert(hasWindow(df))
    }
  }
}
