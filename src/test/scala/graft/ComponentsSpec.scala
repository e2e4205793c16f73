package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** [[Components.minLabelComponents]] — min-label fast path with
  * star-round escalation: exact components on cliques/chains
  * REGARDLESS of id placement or round budget (a tripped fast-path
  * budget escalates to the alternating star algorithm instead of
  * failing), with early exit at the detected fixed point.
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], iters: Int = 8): Map[Long, Long] = {
    val df = edges.toDF("i", "j")
    Components.minLabelComponents(df, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("disjoint pairs and a triangle cluster correctly") {
    val got = comps(Seq((1L, 2L), (5L, 6L), (6L, 7L), (5L, 7L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L,
      10L -> 10L, 11L -> 10L))
  }

  test("a chain converges to the min endpoint") {
    val got = comps(Seq((4L, 3L), (3L, 2L), (2L, 1L)), iters = 5)
    assert(got.values.toSet == Set(1L))
  }

  test("a tripped fast-path budget escalates and still resolves exactly") {
    // a 200-node path cannot reach the label fixed point in 2 fast
    // rounds — the star escalation must deliver the exact clustering
    // anyway, never a partial one
    val path = (1L to 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(comps(path, iters = 2).values.toSet == Set(1L))
  }

  test("long ascending chain resolves (doubling covers it within the fast budget)") {
    // ascending ids are the label loop's GOOD case: the pointer chase
    // doubles per round, so 12 fast rounds cover a diameter-199 chain
    // (the boilerplate-chain shape a real corpus dedup hits)
    val path = (1L to 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(comps(path, iters = 12).values.toSet == Set(1L))
  }

  test("adversarial id placement: alternating local minima still converge") {
    // the label loop's trap: small ids interleaved with large ones
    // make every small id a LOCAL minimum, so label chasing
    // degenerates to one position per round and the fast budget
    // trips. The star escalation is id-order independent — both
    // chains resolve exactly at the default budget.
    val ids = Seq(2L, 100L, 3L, 101L, 4L, 102L, 5L, 103L, 1L)
    val path = ids.sliding(2).map(s => (s(0), s(1))).toSeq
    assert(comps(path).values.toSet == Set(1L))
    // 100 nodes, every odd position a fresh local minimum
    val longIds = (0 until 50).flatMap(k => Seq(k.toLong + 2, 1000L + k))
      .:+ (1L)
    val longPath = longIds.sliding(2).map(s => (s(0), s(1))).toSeq
    assert(comps(longPath).values.toSet == Set(1L))
  }

  test("early exit: tiny components finish before the round cap") {
    // pairs have diameter 1 — a huge cap must not cost extra rounds
    // (observable as: it terminates fast and correctly)
    val got = comps(Seq((100L, 200L)), iters = 50)
    assert(got == Map(100L -> 100L, 200L -> 100L))
  }

  test("duplicate and reversed input pairs do not change the clustering") {
    val got = comps(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
