package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 CSV-endpoint connector: read side (schema, per-day input
  * splits, date-filter pushdown pruning partitions before any fetch,
  * the CSV parse itself) and write side (staged-commit sink,
  * append/overwrite modes).
  */
class ThetaCsvSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def read(days: Int) = spark.read
    .format("graft.sources.dsv2.ThetaCsvSource")
    .option("root", "AAPL").option("start", "2024-01-02")
    .option("days", days.toString).load()

  test("reads days x barsPerDay parsed rows with the canonical schema") {
    val df = read(5)
    assert(df.schema.fieldNames.toSeq ==
      Seq("day", "ts", "root", "open", "high", "low", "close", "volume"))
    assert(df.count() == 5L * graft.sources.dsv2.ThetaCsvSource.barsPerDay)
    val first = df.orderBy($"ts").head()
    assert(first.getAs[String]("root") == "AAPL")
    assert(first.getAs[java.sql.Timestamp]("ts").toString.contains("09:30"))
    // OHLC sanity straight from the parsed CSV
    assert(df.filter($"low" > $"high").count() == 0)
  }

  test("date filters push down and prune day partitions pre-fetch") {
    val df = read(10)
    val filtered = df.filter($"day" >= lit("2024-01-08").cast("date"))
    // 2024-01-02 + 0..9 -> surviving days are 01-08..01-11 = 4 partitions
    assert(filtered.rdd.getNumPartitions == 4)
    assert(filtered.count() == 4L * graft.sources.dsv2.ThetaCsvSource.barsPerDay)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("ThetaCsvScan"), plan.take(300))
    // unfiltered scan keeps one split per day (the S4 fan-out shape)
    assert(df.rdd.getNumPartitions == 10)
  }

  test("equality filter prunes to a single day") {
    val one = read(10).filter($"day" === lit("2024-01-05").cast("date"))
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == graft.sources.dsv2.ThetaCsvSource.barsPerDay)
  }

  test("DSv2 sink round-trip: bars write through the connector and read back equal") {
    val dir = Files.createTempDirectory("graft_csv_sink").toFile.getAbsolutePath
    val bars = read(3)
    bars.write.format("graft.sources.dsv2.GraftCsvSink")
      .option("path", dir).mode("append").save()
    val back = spark.read.option("header", "true")
      .schema("day date, ts timestamp, root string, open double, high double, " +
        "low double, close double, volume bigint")
      .csv(dir)
    assert(back.count() == bars.count())
    assert(back.except(bars).count() == 0)
    assert(bars.except(back).count() == 0)
    // no staging residue after commit
    assert(!new File(dir).listFiles().exists(_.getName.startsWith(".staging")))
  }

  test("DSv2 sink modes: append accumulates, overwrite truncates (K1 replace)") {
    val dir = Files.createTempDirectory("graft_csv_sink_modes").toFile.getAbsolutePath
    val bars = read(2)
    val fmt = "graft.sources.dsv2.GraftCsvSink"
    bars.write.format(fmt).option("path", dir).mode("append").save()
    bars.write.format(fmt).option("path", dir).mode("append").save()
    def readBack() = spark.read.option("header", "true")
      .schema("day date, ts timestamp, root string, open double, high double, " +
        "low double, close double, volume bigint")
      .csv(dir)
    assert(readBack().count() == 2 * bars.count())
    bars.write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(readBack().count() == bars.count())
  }
}
