package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SessionQueries

/** q133 funnel ORDERING semantics on planted users: stages must occur
  * strictly after the previous stage (a purchase before the first view
  * does not convert), the earliest qualifying event wins, and users
  * with no view never appear.
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("stage timestamps respect strict ordering and earliest-wins") {
    val ev = Seq(
      // u1: full funnel in order
      (1L, "view", ts(0), 1L), (1L, "click", ts(5), 2L), (1L, "purchase", ts(9), 3L),
      // u2: purchase BEFORE view and click -> only stage 1+2 count
      (2L, "purchase", ts(0), 4L), (2L, "view", ts(1), 5L), (2L, "click", ts(2), 6L),
      // u3: click before view -> stalls at stage 1
      (3L, "click", ts(0), 7L), (3L, "view", ts(1), 8L),
      // u4: no view at all -> absent from output
      (4L, "click", ts(0), 9L), (4L, "purchase", ts(1), 10L),
      // u5: two clicks after view -> earliest qualifying click wins
      (5L, "view", ts(0), 11L), (5L, "click", ts(8), 12L), (5L, "click", ts(3), 13L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = SessionQueries.eventFunnelCore(ev)
      .select($"user_id", $"view_ts", $"click_ts", $"purchase_ts", $"stages_reached")
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp], Long)]
      .collect().map(r => r._1 -> r).toMap

    assert(out.keySet == Set(1L, 2L, 3L, 5L), "u4 has no view and must be absent")
    assert(out(1L)._5 == 3 && out(1L)._4.contains(ts(9)))
    assert(out(2L)._5 == 2, "purchase before view must not convert")
    assert(out(2L)._3.contains(ts(2)))
    assert(out(3L)._5 == 1, "click before view must not count")
    assert(out(5L)._3.contains(ts(3)), "earliest qualifying click wins")
  }
}
