package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects both native functions") {
    // The extensions hook itself applies cleanly and twice (idempotent
    // from the engine's side); the live integration is asserted below
    // against the shared session, which SessionDefaults builds with
    // `spark.sql.extensions=graft.plans.GraftExtensions`.
    val ext = new SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    new graft.plans.GraftExtensions().apply(ext)
  }

  test("the shared session runs with the extensions installed") {
    val spark = TestSpark.spark
    // native SQL functions resolve without any manual registration
    val r = spark.sql(
      "SELECT bounded_top_k(struct(x), 2) AS t FROM VALUES (3), (1), (2) v(x)")
      .selectExpr("transform(t, e -> e.x) AS xs").head().getSeq[Int](0)
    assert(r == Seq(1, 2))
    // and the rank-limit rewrite fires on the plain-SQL window idiom
    val df = spark.sql(
      """SELECT * FROM (
        |  SELECT x, g, row_number() OVER (PARTITION BY g ORDER BY x) AS rn
        |  FROM VALUES (1, 'a'), (2, 'a'), (3, 'b') v(x, g)) WHERE rn <= 1""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }
}
