package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The schema-adaptive events loader and the testdata-drift guard —
  * the Aug-13 regeneration changed `events.ts`'s parquet physical
  * type and silently killed every events query; these tests pin the
  * loader's branch behavior and prove the guard names drift loudly.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val driverDir = "/root/testdata/sf0.001"

  test("events loads with a session-TZ timestamp ts whatever the vintage") {
    val df = Tables.load(spark, driverDir, "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.count() > 0)
  }

  test("eventsInRange pushes the range into the scan and brackets correctly") {
    val all = Tables.load(spark, driverDir, "events")
    val lo = "2024-01-05"
    val hi = "2024-01-07"
    val ranged = Tables.eventsInRange(spark, driverDir, lo, hi)
    val expected = all.filter(
      col("ts") >= lit(s"$lo 00:00:00").cast("timestamp") &&
        col("ts") < lit(s"$hi 00:00:00").cast("timestamp")).count()
    assert(ranged.count() == expected && expected > 0)
    // the predicate must reach the FileScan, not sit above a conversion
    val scan = ranged.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PushedFilters") &&
      (scan.contains("GreaterThanOrEqual(ts") || scan.contains("DataFilters")),
      scan)
  }

  test("loadSpreadLocal: spreads on the local profile, plain scan on cluster") {
    val dir = "/root/testdata/sf0.001"
    val localPlan = Tables.loadSpreadLocal(spark, dir, "lineitem", spread = true)
      .queryExecution.executedPlan.toString
    assert(localPlan.contains("Exchange RoundRobinPartitioning"),
      "local profile must round-robin the scan:\n" + localPlan)
    val clusterPlan = Tables.loadSpreadLocal(spark, dir, "lineitem", spread = false)
      .queryExecution.executedPlan.toString
    assert(!clusterPlan.contains("Exchange"),
      "cluster profile must be the untouched scan (row groups parallelize it):\n" + clusterPlan)
  }

  test("assertSchemas passes on driver data and names a drifted column") {
    Tables.assertSchemas(spark, driverDir) // must not throw
    // plant a drifted copy: events.ts as bigint (the pre-drift shape
    // the guard must call out when the loader contract breaks), plus
    // every other table symlink-equivalent via real parquet
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    Tables.all.foreach { t =>
      if (t == "events")
        Tables.load(spark, driverDir, "events")
          .withColumn("ts", lit("not a timestamp"))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      else
        spark.read.parquet(s"$driverDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val e = intercept[RuntimeException] { Tables.assertSchemas(spark, dir) }
    assert(e.getMessage.contains("events") && e.getMessage.contains("ts"),
      e.getMessage)
  }
}
