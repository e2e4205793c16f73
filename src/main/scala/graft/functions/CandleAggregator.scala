package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass OHLC candle as a typed `Aggregator[IN, BUF, OUT]` — the
  * custom-aggregate extension point (SURVEY §2.9 notes it's the tool
  * for operator families Spark lacks as builtins).
  *
  * Semantically equal to the min_by/max_by composition in
  * `CoreOps.resampleOhlc`, but ONE buffer per group instead of six
  * independent aggregate buffers, and usable wherever a single
  * aggregate column is wanted (`ds.groupBy(...).agg(candle(...))`).
  * The buffer is a flat product type → Spark's ObjectHashAggregate
  * path with map-side partial merge; merge() is associative and
  * commutative (total order on (ts, seq)), so results are identical
  * under any partitioning.
  */
object CandleAggregator {

  /** (epoch-micros ts, tie-break seq, price). */
  final case class Tick(ts: Long, seq: Long, price: Double)

  final case class Buf(
      openTs: Long, openSeq: Long, open: Double,
      closeTs: Long, closeSeq: Long, close: Double,
      high: Double, low: Double, n: Long)

  final case class Candle(open: Double, high: Double, low: Double,
      close: Double, n: Long)

  private def first(a: Buf, b: Buf): Boolean =
    a.openTs < b.openTs || (a.openTs == b.openTs && a.openSeq < b.openSeq)

  private def last(a: Buf, b: Buf): Boolean =
    a.closeTs > b.closeTs || (a.closeTs == b.closeTs && a.closeSeq > b.closeSeq)

  val candle: Aggregator[Tick, Buf, Candle] = new Aggregator[Tick, Buf, Candle] {
    override def zero: Buf =
      Buf(Long.MaxValue, Long.MaxValue, 0.0, Long.MinValue, Long.MinValue, 0.0,
        Double.NegativeInfinity, Double.PositiveInfinity, 0L)

    override def reduce(b: Buf, t: Tick): Buf =
      merge(b, Buf(t.ts, t.seq, t.price, t.ts, t.seq, t.price, t.price, t.price, 1L))

    override def merge(a: Buf, b: Buf): Buf = {
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        val (oTs, oSeq, o) =
          if (first(a, b)) (a.openTs, a.openSeq, a.open) else (b.openTs, b.openSeq, b.open)
        val (cTs, cSeq, c) =
          if (last(a, b)) (a.closeTs, a.closeSeq, a.close) else (b.closeTs, b.closeSeq, b.close)
        Buf(oTs, oSeq, o, cTs, cSeq, c,
          math.max(a.high, b.high), math.min(a.low, b.low), a.n + b.n)
      }
    }

    override def finish(b: Buf): Candle =
      Candle(b.open, b.high, b.low, b.close, b.n)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Candle] = Encoders.product[Candle]
  }
}
