package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{FinanceApi, MarketConfig, SyntheticMarket}
import graft.operators.TickerSplice

class FinanceApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val api = new FinanceApi(
    SyntheticMarket.quotes(spark, dir),
    SyntheticMarket.ohlc(spark, dir),
    SyntheticMarket.oi(spark, dir),
    aliases = Seq(TickerSplice.Alias(3L, 2L, "2024-01-15")))

  test("retrieveQuote: hourly bars inside business hours with derived columns") {
    val bars = api.retrieveQuote(5L, "2024-01-02", "2024-01-20", "1 hour")
    assert(bars.count() > 0)
    val bad = bars.filter(
      hour($"datetime") * 60 + minute($"datetime") < 9 * 60 ||
        $"low" > $"high" || $"close_bid" > $"close_ask").count()
    assert(bad == 0)
    assert(bars.columns.contains("weighted_midpoint"))
  }

  test("retrieveEodOhlc: quote timeline preserved, OHLC bootstrapped, volume filled") {
    val eod = api.retrieveEodOhlc(5L, "2024-01-02", "2024-01-20")
    val q = api.retrieveQuote(5L, "2024-01-02", "2024-01-20", "1 day")
    assert(eod.count() == q.count()) // complete quote timeline kept (J1)
    assert(eod.filter($"open".isNull || $"volume".isNull).count() == 0)
    assert(eod.filter(hour($"datetime") =!= 16).count() == 0) // EOD stamp
  }

  test("ticker splice folds pre-rename history into the current root") {
    import java.sql.Timestamp
    val q = Seq(
      // old symbol trades before the rename, new symbol after;
      // stray old-symbol row AFTER the change must be excluded
      (2L, Timestamp.valueOf("2024-01-10 10:00:00"), 1L, 10.0, 10.2, 1L, 1L),
      (2L, Timestamp.valueOf("2024-01-20 10:00:00"), 2L, 11.0, 11.2, 1L, 1L),
      (3L, Timestamp.valueOf("2024-01-20 11:00:00"), 3L, 12.0, 12.2, 1L, 1L)
    ).toDF("root", "ts", "seq", "bid", "ask", "bid_size", "ask_size")
    val apiF = new FinanceApi(q, q.limit(0), q.limit(0),
      aliases = Seq(TickerSplice.Alias(3L, 2L, "2024-01-15")))
    val dates = apiF.listDates(3L).as[java.sql.Date].collect().map(_.toString)
    assert(dates.toSeq == Seq("2024-01-10", "2024-01-20"))
    // all surviving rows carry the current root
    val snap = apiF.snapshotQuote().filter($"root" === 2L).count()
    assert(snap >= 0) // snapshot is alias-agnostic; splice path below
    val hist = graft.operators.TickerSplice.splicedHistory(
      q, "root", "ts", TickerSplice.Alias(3L, 2L, "2024-01-15"), Seq("seq"))
    assert(hist.filter($"root" =!= 3L).count() == 0)
    assert(hist.count() == 2) // Jan-10 old row + Jan-20 new row
  }

  test("retrieveOpenInterest: one row per (root, day), latest wins") {
    val oi = api.retrieveOpenInterest(5L, "2024-01-01", "2024-02-01")
    assert(oi.groupBy("root", "day").count().filter($"count" > 1).count() == 0)
  }

  test("snapshotQuote: exactly one latest row per root") {
    val snap = api.snapshotQuote()
    assert(snap.count() == snap.select("root").distinct().count())
  }

  test("market config controls the business-hours window") {
    val openAll = new FinanceApi(
      SyntheticMarket.quotes(spark, dir),
      SyntheticMarket.ohlc(spark, dir),
      SyntheticMarket.oi(spark, dir),
      cfg = MarketConfig(openMin = 0, closeMin = 1439))
    val all = openAll.retrieveQuote(5L, "2024-01-02", "2024-01-20", "1 hour").count()
    val bus = api.retrieveQuote(5L, "2024-01-02", "2024-01-20", "1 hour").count()
    assert(all > bus)
  }
}
