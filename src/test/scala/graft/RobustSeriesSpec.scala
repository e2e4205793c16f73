package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{SessionQueries, TimeSeriesQueries}

/** q137 linear interpolation and q138 robust outlier semantics on
  * planted fixtures: gap values must be the exact time-weighted blend
  * of the nearest observed neighbors, observed values must pass
  * through untouched, and the MAD baseline must (a) flag only the
  * planted extreme and (b) go silent when a cell's MAD is zero.
  */
class RobustSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hourTs(h: Int) = new Timestamp(1700000000000L - (1700000000000L % 3600000L) + h * 3600000L)

  test("interior gaps blend linearly; observed rows pass through") {
    val hourly = Seq(
      // type a: observed at h0 (1.0) and h3 (4.0) -> h1, h2 interpolated
      ("a", hourTs(0), 1.0), ("a", hourTs(3), 4.0),
      // type b: dense, nothing to fill
      ("b", hourTs(0), 5.0), ("b", hourTs(1), 7.0))
      .toDF("event_type", "bucket", "v")
    val out = TimeSeriesQueries.linearInterpolateCore(hourly)
      .as[(String, Timestamp, Option[Double], Boolean)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap

    assert(out.size == 6, "grid spans min..max per type: 4 + 2 rows")
    assert(out(("a", hourTs(0))) == (Some(1.0), false))
    assert(out(("a", hourTs(1))) == (Some(2.0), true), "1/3 of the way 1.0 -> 4.0")
    assert(out(("a", hourTs(2))) == (Some(3.0), true), "2/3 of the way 1.0 -> 4.0")
    assert(out(("a", hourTs(3))) == (Some(4.0), false))
    assert(out(("b", hourTs(0))) == (Some(5.0), false))
    assert(out(("b", hourTs(1))) == (Some(7.0), false))
  }

  test("uneven spacing weights by time, not by grid position") {
    // observed at h0 (0.0) and h4 (8.0): h1 -> 2.0, h3 -> 6.0
    val hourly = Seq(("a", hourTs(0), 0.0), ("a", hourTs(4), 8.0))
      .toDF("event_type", "bucket", "v")
    val out = TimeSeriesQueries.linearInterpolateCore(hourly)
      .as[(String, Timestamp, Option[Double], Boolean)]
      .collect().map(r => r._2 -> r._3).toMap
    assert(out(hourTs(1)).contains(2.0))
    assert(out(hourTs(3)).contains(6.0))
  }

  test("MAD baseline flags only the planted extreme, with the right score") {
    val base = 1700000000000L
    val ev = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).zipWithIndex.map {
      case (v, i) => (i.toLong, new Timestamp(base + i * 1000L), "click", v)
    }.toDF("event_id", "ts", "event_type", "value")
    val out = SessionQueries.robustOutliersCore(ev)
      .as[(Long, Timestamp, String, Long, Double, Double, Double, Double)]
      .collect()
    // percentile_disc(0.5) of [1..5,100] = 3; devs [2,1,0,1,2,97] -> MAD = 1
    assert(out.map(_._1).toSeq == Seq(5L), "only the 100.0 row is beyond 4.4478 MADs")
    assert(out.head._6 == 3.0 && out.head._7 == 1.0)
    assert(math.abs(out.head._8 - math.rint(97.0 / 1.4826 * 1e6) / 1e6) < 1e-9)
  }

  test("transition lift counts consecutive pairs per user and emits exact ppb") {
    val base = 1700000000000L
    def row(u: Long, i: Int, t: String) =
      (u, new Timestamp(base + i * 1000L), u * 100 + i, t)
    val ev = (Seq("a", "b", "a", "b").zipWithIndex.map { case (t, i) => row(1L, i, t) } ++
      Seq("b", "c").zipWithIndex.map { case (t, i) => row(2L, i, t) } ++
      Seq("a", "c").zipWithIndex.map { case (t, i) => row(3L, i, t) })
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = SessionQueries.transitionLiftCore(ev)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // transitions: u1 a->b, b->a, a->b; u2 b->c; u3 a->c
    // counts: (a,b)=2 (b,a)=1 (b,c)=1 (a,c)=1; n_tot=5
    // n_src: a=3 b=2; n_dst: a=1 b=2 c=2
    assert(out.keySet == Set(("a", "b"), ("b", "a"), ("b", "c"), ("a", "c")))
    val ab = out(("a", "b"))
    assert(ab._3 == 2 && ab._4 == 3 && ab._5 == 2 && ab._6 == 5)
    assert(ab._7 == 666666666L, "p(a->b) = 2e9 div 3, floored")
    assert(ab._8 == 1666666666L, "lift = 2*5*1e9 div (3*2), floored")
    assert(out(("b", "c"))._8 == 1250000000L, "lift = 1*5*1e9 div (2*2)")
  }

  test("a zero-MAD cell (constant values) never flags") {
    val base = 1700000000000L
    val ev = (0 until 8).map(i => (i.toLong, new Timestamp(base + i * 1000L), "view", 2.0))
      .toDF("event_id", "ts", "event_type", "value")
    assert(SessionQueries.robustOutliersCore(ev).count() == 0)
  }

  test("attribution: latest click wins, 7-day cutoff, direct bucket, shares sum") {
    val t0 = 1700000000000L
    val hour = 3600000L
    def e(id: Long, u: Long, tpe: String, atMs: Long, v: Double, ch: Int) =
      (id, new Timestamp(atMs), u, tpe, v, s"c$ch")
    val ev = Seq(
      e(1, 1, "click", t0, 0.0, 2), e(2, 1, "purchase", t0 + hour, 100.0, 0),
      e(3, 2, "click", t0, 0.0, 1), e(4, 2, "click", t0 + 2 * hour, 0.0, 3),
      e(5, 2, "purchase", t0 + 3 * hour, 50.0, 0),
      e(6, 3, "click", t0, 0.0, 1),
      e(7, 3, "purchase", t0 + 8L * 24 * hour, 25.0, 0), // outside 7 days
      e(8, 4, "purchase", t0, 25.0, 0))                  // never clicked
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = SessionQueries.channelAttributionCore(ev)
      .as[(Long, Long, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(-1L, 2L, 3L))
    assert(out(2L) == ((2L, 1L, 100.0, 500000000L)))
    assert(out(3L) == ((3L, 1L, 50.0, 250000000L)), "latest click wins")
    assert(out(-1L) == ((-1L, 2L, 50.0, 250000000L)), "stale + never-clicked are direct")
    assert(out.values.map(_._4).sum == 1000000000L, "shares sum to exactly 1e9")
  }

  test("conversion latency buckets are exact powers of two via bit-length") {
    val t0 = 1700000000000L
    def conv(u: Long, latMs: Long) = Seq(
      (u * 10 + 1, new Timestamp(t0), u, "view", 0.0, ""),
      (u * 10 + 2, new Timestamp(t0 + 100), u, "click", 0.0, ""),
      (u * 10 + 3, new Timestamp(t0 + latMs), u, "purchase", 1.0, ""))
    // latencies: 600 ms -> 0 s -> clamped to 1 -> bucket 0;
    // 2 s -> bucket 1; 5 s -> bucket 2; 300 s -> bucket 8 (256..511)
    val ev = (conv(1, 600) ++ conv(2, 2000) ++ conv(3, 5000) ++ conv(4, 300000))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = SessionQueries.conversionLatencyCore(ev)
      .as[(Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 8L))
    assert(out(0L) == ((0L, 1L, 1L, 0L, 0L)))
    assert(out(2L) == ((2L, 4L, 1L, 5L, 5L)))
    assert(out(8L) == ((8L, 256L, 1L, 300L, 300L)))
  }

  test("behavior correlation: proportional counts give r=1, constants give null") {
    val t0 = 1700000000000L
    var id = 0L
    def burst(u: Long, tpe: String, k: Int) = (0 until k).map { _ =>
      id += 1; (id, new Timestamp(t0 + id), u, tpe)
    }
    // a and b perfectly proportional per user; c constant (variance 0)
    val ev = (burst(1, "a", 1) ++ burst(1, "b", 2) ++ burst(1, "c", 1) ++
      burst(2, "a", 2) ++ burst(2, "b", 4) ++ burst(2, "c", 1) ++
      burst(3, "a", 3) ++ burst(3, "b", 6) ++ burst(3, "c", 1))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = SessionQueries.behaviorCorrelationCore(ev)
      .as[(String, String, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b"))._3 == 3)
    assert(math.abs(out(("a", "b"))._4.get - 1.0) < 1e-12, "proportional => r ~ 1")
    assert(out(("a", "c"))._4.isEmpty, "zero variance must yield null, not NaN")
    assert(out(("b", "c"))._4.isEmpty)
  }

  test("RFM: quartile indices count percentile_disc cut points at or below") {
    val t0 = 1700000000000L
    var id = 0L
    def ev(u: Long, tpe: String, v: Double) = { id += 1; (id, new Timestamp(t0 + id), u, tpe, v) }
    // frequencies 1,2,3,4; purchases: u2 5.0, u4 10.0 -> monetary [0,5,0,10]
    val rows = Seq(ev(1, "view", 0.0)) ++
      Seq(ev(2, "view", 0.0), ev(2, "purchase", 5.0)) ++
      (1 to 3).map(_ => ev(3, "view", 0.0)) ++
      ((1 to 3).map(_ => ev(4, "view", 0.0)) :+ ev(4, "purchase", 10.0))
    val out = SessionQueries.rfmSegmentsCore(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .as[(Long, Long, Long, Double, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // same-day activity -> recency 0 for all, r cuts [0,0,0] -> r_q 3
    // freq cuts disc(.25/.5/.75) over [1,2,3,4] = [1,2,3] -> f_q 1,2,3,3
    // monetary cuts over [0,0,5,10] = [0,0,5] -> m_q 2,3,2,3
    assert(out(1L) == ((1L, 0L, 1L, 0.0, 3L, 1L, 2L, 312L)))
    assert(out(2L) == ((2L, 0L, 2L, 5.0, 3L, 2L, 3L, 323L)))
    assert(out(3L) == ((3L, 0L, 3L, 0.0, 3L, 3L, 2L, 332L)))
    assert(out(4L) == ((4L, 0L, 4L, 10.0, 3L, 3L, 3L, 333L)))
  }

  test("novelty: originals score 1e9, verbatim copies score 0, short docs null") {
    val docs = Seq(
      (1L, "a b c d"),            // shingles "a b c", "b c d" — all first here
      (2L, "a b c d"),            // verbatim copy — nothing novel
      (3L, "x y z w"),            // fresh text — fully novel
      (4L, "a b"))                // too short for a 3-shingle
      .toDF("doc_id", "text")
    val out = queries.TextQueries.ngramNoveltyCore(docs)
      .as[(Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 2L, Some(1000000000L))))
    assert(out(2L) == ((2L, 2L, 0L, Some(0L))))
    assert(out(3L) == ((3L, 2L, 2L, Some(1000000000L))))
    assert(out(4L) == ((4L, 0L, 0L, None)))
  }

  test("EMA halves each hour back and adapts its denominator across gaps") {
    val h0 = hourTs(0).getTime
    def ev(h: Int, v: Double) = ("a", new Timestamp(h0 + h * 3600000L), v)
    // hours 0 (2.0) and 1 (4.0) observed; hour 2 missing; hour 3 (8.0)
    val events = Seq(ev(0, 2.0), ev(1, 4.0), ev(3, 8.0))
      .toDF("event_type", "ts", "value")
    val out = queries.TimeSeriesQueries.emaHourlyCore(events)
      .as[(String, Timestamp, Double, Double)]
      .collect().map(r => r._2.getTime -> (r._3, r._4)).toMap
    assert(out.size == 3, "EMA only emitted for observed hours")
    assert(out(h0) == ((2.0, 2.0)), "first hour: EMA = its own value")
    // h1: (4*2^23 + 2*2^22) / (2^23 + 2^22) = 10/3
    assert(math.abs(out(h0 + 3600000L)._2 - 10.0 / 3.0) < 1e-9)
    // h3: (8*2^23 + 4*2^21 + 2*2^20) / (2^23 + 2^21 + 2^20) = 74/11
    assert(math.abs(out(h0 + 3 * 3600000L)._2 - 74.0 / 11.0) < 1e-9)
  }
}
