package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CalendarOps._
import graft.operators.CoreOps

class CalendarOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("busRange excludes weekends and holidays") {
    val days = busRange(spark, "2024-01-01", "2024-01-14",
      Seq("2024-01-01", "2024-01-08"))
      .orderBy("day").as[Date].collect().map(_.toString)
    // Jan 2024: 1=Mon(holiday) 2-5 Tue-Fri, 6/7 weekend, 8=Mon(holiday),
    // 9-12 Tue-Fri, 13/14 weekend
    assert(days.toSeq == Seq("2024-01-02", "2024-01-03", "2024-01-04",
      "2024-01-05", "2024-01-09", "2024-01-10", "2024-01-11", "2024-01-12"))
  }

  test("anchored buckets: W-FRI, month-end, quarter-end, year-start") {
    val d = Seq(
      Date.valueOf("2024-02-14"), // Wed -> Fri 2024-02-16, Q1 end 03-31
      Date.valueOf("2024-02-16"), // Fri maps to itself
      Date.valueOf("2024-11-30")  // Sat... filtered by isWeekday normally
    ).toDF("d")
    val out = d.select(
      weekEndingFriday($"d").as("wf"),
      monthEnd($"d").as("me"),
      quarterEnd($"d").as("qe"),
      yearStart($"d").as("ys")).collect()
    assert(out(0).get(0).toString == "2024-02-16")
    assert(out(1).get(0).toString == "2024-02-16")
    assert(out(0).get(1).toString == "2024-02-29") // leap month end
    assert(out(0).get(2).toString == "2024-03-31")
    assert(out(2).get(2).toString == "2024-12-31")
    assert(out(0).get(3).toString == "2024-01-01")
  }

  test("ms conversions round-trip and EOD shift hits 16:00 only at midnight") {
    val t = Seq(
      Timestamp.valueOf("2024-01-01 09:30:15"),
      Timestamp.valueOf("2024-01-01 00:00:00")
    ).toDF("ts")
    val out = t.select(
      msOfDay($"ts").as("ms"),
      msToTimeString(msOfDay($"ts")).as("str"),
      eodShift($"ts").as("eod")).collect()
    assert(out(0).getLong(0) == (9 * 3600 + 30 * 60 + 15) * 1000L)
    assert(out(0).getString(1) == "09:30:15")
    assert(out(0).getTimestamp(2).toString == "2024-01-01 09:30:15.0") // untouched
    assert(out(1).getTimestamp(2).toString == "2024-01-01 16:00:00.0") // shifted
  }

  test("bootstrapOhlc fills missing bars from the midpoint") {
    val df = Seq(
      (Some(10.0), Some(11.0), Some(9.0), Some(10.5), 10.2),
      (None, None, None, None, 7.7)
    ).toDF("open", "high", "low", "close", "midpoint")
    val out = CoreOps.bootstrapOhlc(df).orderBy($"midpoint".desc).collect()
    assert(out(0).getDouble(0) == 10.0) // present values untouched
    assert((1 to 4).forall(i => out(1).getDouble(i - 1) == 7.7))
  }
}
