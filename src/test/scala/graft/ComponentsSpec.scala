package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** [[Components.minLabelComponents]] — min-label propagation with
  * convergence semantics: exact components on cliques/chains, early
  * exit once labels fix, and a loud failure (never a silently wrong
  * clustering) when the diameter exceeds the round budget.
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] = {
    val df = edges.toDF("i", "j")
    Components.minLabelComponents(df, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("disjoint pairs and a triangle cluster correctly") {
    val got = comps(Seq((1L, 2L), (5L, 6L), (6L, 7L), (5L, 7L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L,
      10L -> 10L, 11L -> 10L))
  }

  test("a chain converges to the min endpoint (diameter within budget)") {
    val got = comps(Seq((4L, 3L), (3L, 2L), (2L, 1L)), iters = 5)
    assert(got.values.toSet == Set(1L))
  }

  test("insufficient rounds on a long path fail loudly, not silently") {
    val path = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
    assertThrows[IllegalArgumentException](comps(path, iters = 3))
    // and a sufficient budget resolves the same path
    assert(comps(path, iters = 10).values.toSet == Set(1L))
  }

  test("pointer doubling: a diameter-199 chain resolves in O(log d) rounds") {
    // plain min-propagation would need ~199 rounds; the doubled
    // schedule covers pointer distance 2^(r-1) per round, so 12
    // rounds are ample for a 200-node path — the boilerplate-chain
    // shape a real corpus dedup hits
    val path = (1L to 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(comps(path, iters = 12).values.toSet == Set(1L))
  }

  test("pointer doubling: the default budget covers diameter 16") {
    // 2^(5-1) = 16 — the default iters=5 now certifies any graph of
    // diameter ≤ 16, not ≤ 5
    val path = (1L to 17L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(comps(path, iters = 5).values.toSet == Set(1L))
  }

  test("early exit: tiny components finish before the round cap") {
    // pairs have diameter 1 — a huge cap must not cost extra rounds
    // (observable as: it terminates fast and correctly)
    val got = comps(Seq((100L, 200L)), iters = 50)
    assert(got == Map(100L -> 100L, 200L -> 100L))
  }
}
