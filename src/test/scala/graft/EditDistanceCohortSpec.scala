package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{SessionQueries, TextQueries}

/** Planted-fixture semantics for q134 (blocked edit-distance dedup)
  * and q135 (cohort retention).
  */
class EditDistanceCohortSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q134: prefix blocking, 128-char truncation, threshold, hot-block cap") {
    val base = "shared prefix here and then some more words follow " + ("x " * 60)
    val docs = Seq(
      1L -> base,
      2L -> base.replace("more", "mole"),          // 1 edit within head
      3L -> ("different head entirely " + base),   // other block
      4L -> (base.take(130) + " TAIL-ONLY-CHANGE AFTER TRUNCATION"),
      // a hot block: 65 docs sharing a prefix must be dropped entirely
      5L -> base) ++ (100L until 165L).map(i => i -> s"hotblockprefix!! unique tail $i")
    val out = TextQueries.editDistanceDedupCore(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap

    assert(out.contains((1L, 2L)) && out((1L, 2L)) == 1L, "one-edit pair found")
    assert(out.contains((1L, 5L)) && out((1L, 5L)) == 0L, "exact pair at distance 0")
    assert(out.contains((1L, 4L)) && out((1L, 4L)) == 0L,
      "change past the 128-char head is invisible to the verify")
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "different block never pairs")
    assert(!out.keySet.exists(p => p._1 >= 100L),
      "hot block (>64 members) is dropped, not exploded")
  }

  test("q135: cohorting by first day, per-day dedup, offset arithmetic") {
    def ts(day: Int, hour: Int) =
      Timestamp.valueOf(f"2024-02-${day}%02d $hour%02d:00:00")
    val ev = Seq(
      // u1: day1 (twice — must dedup), day3
      (1L, ts(1, 9)), (1L, ts(1, 17)), (1L, ts(3, 9)),
      // u2: joins day2 only
      (2L, ts(2, 12)),
      // u3: day1 and day2
      (3L, ts(1, 1)), (3L, ts(2, 23))).toDF("user_id", "ts")
    val out = SessionQueries.cohortRetentionCore(ev)
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(out == Map(
      ("2024-02-01", 0L) -> 2L,  // u1+u3 day-0
      ("2024-02-01", 1L) -> 1L,  // u3 returns next day
      ("2024-02-01", 2L) -> 1L,  // u1 returns at offset 2
      ("2024-02-02", 0L) -> 1L), // u2's own cohort
      out.toString)
  }
}
