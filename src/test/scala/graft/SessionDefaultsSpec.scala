package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session layer IS part of the plan contract: coalescing-off and
  * the local split size are what keep compute-dense stages parallel
  * (DESIGN.md round-14 section), and the extensions wire the native
  * SQL functions + the top-k rewrite. A refactor that drops one of
  * these would silently reintroduce the serialized-stage class while
  * every result stays correct — so the spec pins them.
  */
class SessionDefaultsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("plan-critical session defaults are applied") {
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "false")
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes") == (8 * 1024 * 1024).toString)
    assert(spark.conf.get("spark.sql.extensions").contains("graft.plans.GraftExtensions"))
    // AQE itself (runtime re-plan, skew splitting) must stay available
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") != "false")
  }
}
