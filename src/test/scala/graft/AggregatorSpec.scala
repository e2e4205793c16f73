package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CandleAggregator
import graft.operators.CoreOps._

class AggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("candle aggregator equals the min_by/max_by resample composition") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val candleUdaf = udaf(CandleAggregator.candle)
    val viaAgg = ev
      .select($"event_type", window($"ts", "1 hour")("start").as("bucket"),
        struct(unix_micros($"ts").as("ts"), $"event_id".as("seq"),
          $"value".as("price")).as("tick"))
      .groupBy($"bucket", $"event_type")
      .agg(candleUdaf($"tick.ts", $"tick.seq", $"tick.price").as("c"))
      .select($"bucket", $"event_type", $"c.open", $"c.high", $"c.low",
        $"c.close", $"c.n")
    val ord = struct($"ts", $"event_id")
    val viaComposition = ev
      .groupBy(window($"ts", "1 hour")("start").as("bucket"), $"event_type")
      .agg(min_by($"value", ord).as("open"), max($"value").as("high"),
        min($"value").as("low"), max_by($"value", ord).as("close"),
        count(lit(1)).as("n"))
    assert(viaAgg.count() == viaComposition.count())
    assert(viaAgg.except(viaComposition).count() == 0)
    assert(viaComposition.except(viaAgg).count() == 0)
  }

  test("candle aggregator is partitioning-invariant") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val candleUdaf = udaf(CandleAggregator.candle)
    def run(parts: Int) = ev.repartition(parts)
      .groupBy($"event_type")
      .agg(candleUdaf(unix_micros($"ts"), $"event_id", $"value").as("c"))
      .select($"event_type", $"c.*").collect().toSet
    assert(run(1) == run(13))
  }

  test("saltedSumCount equals plain aggregation") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val salted = saltedSumCount(li, Seq("l_returnflag"), "l_quantity",
      "l_orderkey", 16).orderBy("l_returnflag").collect()
    val plain = li.groupBy($"l_returnflag")
      .agg(dsum($"l_quantity").as("sum_l_quantity"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
