package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trading-calendar operators (SURVEY §2.2 P5, §2.7 F4/F5/F13/F14 and
  * the anchored bucket functions behind A1's business frequencies
  * `B / W-FRI / BME / BQE / BYS`, reference utils.py:349-357).
  *
  * All buckets are arithmetic on the date value — no UDF, no calendar
  * table scan — so they vectorize and stay in codegen. Holidays are a
  * small broadcast table (dbase/utils.py:52-68 `bus_range` semantics:
  * weekdays minus HOLIDAY_SET).
  */
object CalendarOps {

  /** Week bucket anchored to Friday (pandas `W-FRI`): the Friday on or
    * after the date. Spark dayofweek: 1=Sunday … 7=Saturday.
    */
  def weekEndingFriday(d: Column): Column =
    date_add(d, ((lit(6) - dayofweek(d)) + 7) % 7)

  /** Month-end bucket (pandas `BME` label, calendar month end). */
  def monthEnd(d: Column): Column = last_day(d)

  /** Quarter-end bucket (`BQE` label). */
  def quarterEnd(d: Column): Column =
    last_day(add_months(date_trunc("quarter", d), 2))

  /** Year-start bucket (`BYS` label). */
  def yearStart(d: Column): Column = date_trunc("year", d).cast("date")

  /** Weekday predicate (pandas `B` frequency support). */
  def isWeekday(d: Column): Column =
    dayofweek(d) =!= 1 && dayofweek(d) =!= 7

  /** P5 — business-day range: all weekdays in [start, end] minus the
    * holiday set, as a single-column DataFrame. Generated
    * distributively via sequence+explode (no driver loop). Holiday
    * pruning is the codegen [[graft.plans.TradingDayRoll]] predicate
    * (a day is a trading day iff it rolls to itself) — the holiday set
    * rides inside the expression, so no join appears in the plan at
    * all, versus the reference's HOLIDAY_SET scan (dbase/utils.py:
    * 52-68).
    */
  def busRange(spark: SparkSession, start: String, end: String,
      holidays: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf(start)),
        lit(java.sql.Date.valueOf(end)),
        expr("interval 1 day"))).as("day"))
      .filter(graft.plans.NativeFunctions.tradingDayRoll($"day", holidays) === $"day")
  }

  /** F4 — ms-of-day → HH:MM:SS (utils.py:260-266). */
  def msToTimeString(ms: Column): Column =
    format_string("%02d:%02d:%02d",
      (ms / 3600000).cast("long"),
      ((ms % 3600000) / 60000).cast("long"),
      ((ms % 60000) / 1000).cast("long"))

  /** F5 — timestamp → ms-of-day (utils.py:269-275). */
  def msOfDay(ts: Column): Column =
    (hour(ts) * 3600000L + minute(ts) * 60000L + second(ts) * 1000L)

  /** F13 — `add_eod_timestamp` (dbase/utils.py:7-22): midnight-stamped
    * EOD rows shifted to the market close.
    */
  def eodShift(ts: Column, closeHour: Int = 16): Column =
    when(hour(ts) === 0 && minute(ts) === 0 && second(ts) === 0,
      ts + expr(s"interval $closeHour hours")).otherwise(ts)

  /** F14 — `default_timestamp` (dbase/utils.py:25-36): truncate to midnight. */
  def toMidnight(ts: Column): Column = date_trunc("day", ts)

  /** F1 — `normalize_date_format` (utils.py:443-454): any common date
    * string → canonical `yyyy-MM-dd` (type 1) or `yyyyMMdd` (type 2).
    * Formats dispatch by shape (compact, ISO with optional time,
    * US slash), so nothing trips ANSI parsing; unrecognized shapes
    * yield null — the caller's validation boundary, where the
    * reference raises.
    */
  def normalizeDate(c: Column, compact: Boolean = false): Column = {
    val d = when(c.rlike("^[0-9]{8}$"), to_date(c, "yyyyMMdd"))
      .when(c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}"), to_date(substring(c, 1, 10)))
      .when(c.rlike("^[0-9]{2}/[0-9]{2}/[0-9]{4}$"), to_date(c, "MM/dd/yyyy"))
    date_format(d, if (compact) "yyyyMMdd" else "yyyy-MM-dd")
  }
}
