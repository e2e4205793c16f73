package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Intervals._
import graft.operators.CalendarOps

class IntervalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F2 extractNumericValue splits count and unit") {
    assert(extractNumericValue("5m") == ("m", 5))
    assert(extractNumericValue("12h") == ("h", 12))
    assert(extractNumericValue("1d") == ("d", 1))
    assertThrows[IllegalArgumentException](extractNumericValue("nope"))
  }

  test("F3 identifyLength: rt minutes vs trading units") {
    assert(identifyLength("m", 5, rt = true) == 5)
    assert(identifyLength("h", 2, rt = true) == 120)
    assert(identifyLength("w", 1, rt = true) == 10080)
    assert(identifyLength("d", 3) == 3)
    assert(identifyLength("w", 2) == 10)
    assert(identifyLength("y", 1) == 252)
    assert(identifyLength("q", 1) == 91)
    assertThrows[IllegalArgumentException](identifyLength("x", 1))
  }

  test("F6 intervalToMillis: reference map incl. restored M/Q") {
    assert(intervalToMillis("5m") == 300000L)
    assert(intervalToMillis("1h") == 3600000L)
    assert(intervalToMillis("1d") == 86400000L)
    assert(intervalToMillis("1b") == 86400000L)
    // exact-key-first lookup reaches the month/quarter entries the
    // reference's lowercase-first lookup shadows
    assert(intervalToMillis("1M") == 2592000000L)
    assert(intervalToMillis("1Q") == 7776000000L)
    assertThrows[IllegalArgumentException](intervalToMillis("1z"))
  }

  test("toSparkInterval feeds window()/resample") {
    assert(toSparkInterval("5m") == "5 minutes")
    assert(toSparkInterval("1h") == "1 hours")
    assert(toSparkInterval("2d") == "2 days")
    assert(toSparkInterval("10s") == "10 seconds")
    assert(toSparkInterval("100ms") == "100 milliseconds")
  }

  test("sub-second intervals convert; the v3 surface validates against a minimum") {
    // "ms" is the engine extension: the reference's converter has no
    // ms entry even though v3 VALID_INTERVALS enumerates 10ms/100ms
    assert(intervalToMillis("10ms") == 10L)
    assert(intervalToMillis("10s") == 10000L)
    // every enumerated interval except tick converts
    validIntervals.filterNot(_ == "tick").foreach(i => intervalToMillis(i))
    // the MINIMUM_MILLISECONDS gate (v3/utils.py:311-313)
    assert(validateInterval("10s") == 10000L)
    assert(validateInterval("10ms", minimum = "10ms") == 10L)
    val e = intercept[IllegalArgumentException](validateInterval("100ms"))
    assert(e.getMessage.contains("too small"))
    // tick names the raw feed: 0 ms, below any aggregation minimum
    assertThrows[IllegalArgumentException](validateInterval("tick"))
    // a coarser configured minimum rejects fine minute grains too
    assertThrows[IllegalArgumentException](validateInterval("1m", minimum = "5m"))
  }

  test("F1 normalizeDate canonicalizes common shapes, null otherwise") {
    val rows = Seq("20240105", "2024-01-05", "2024-01-05 13:30:00",
      "01/05/2024", "garbage").toDF("s")
    val out = rows.select(
        CalendarOps.normalizeDate($"s").as("iso"),
        CalendarOps.normalizeDate($"s", compact = true).as("compact"))
      .collect()
    assert(out.take(4).forall(_.getString(0) == "2024-01-05"))
    assert(out.take(4).forall(_.getString(1) == "20240105"))
    assert(out(4).isNullAt(0) && out(4).isNullAt(1))
  }
}
