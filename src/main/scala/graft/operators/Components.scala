package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate PAIR list — the step
  * between pair detection (q24/q25/q26/q34) and actual corpus dedup:
  * group transitively-linked documents into one cluster, elect the
  * min-id member as canonical, keep one row per cluster.
  *
  * Algorithm: iterative min-label propagation — each round every node
  * takes the minimum component label among itself, its neighbors, and
  * its label's label (pointer doubling, below); a component converges
  * once the pointer-chase covers its diameter (O(log d)). Near-dup
  * graphs are overwhelmingly tiny cliques/chains (diameter ≤ a few),
  * so a small fixed `iters` with a CONVERGENCE CHECK (one more round
  * must change nothing — cheap: count of changed labels) is the
  * honest distributed plan: each round is one join + one min
  * aggregation on the edge key, partial-combined, no driver-side
  * graph. Each round's label table is `localCheckpoint`ed: persist
  * alone would leave the LOGICAL plan doubling every round (the
  * classic iterative-join blowup — the plan tree, not the data,
  * explodes), while the checkpoint truncates lineage so round N's
  * plan is flat regardless of N. A fault-tolerant cluster deployment
  * would use `checkpoint` with a reliable dir; the loop shape is
  * identical.
  *
  * Each round ALSO pointer-doubles: label(v) := min(..., label(
  * label(v))) — the pointer-chase distance doubles per round, so a
  * path of diameter d converges in O(log d) rounds instead of O(d);
  * a boilerplate-heavy real corpus chains near-dups into long paths,
  * and a 100 TB dedup run dying at hour N on a diameter check is
  * expensive. The check still throws (loudly) if the graph outruns
  * even the doubled schedule.
  *
  * Stage sizing: every frame in the loop is node/edge-cardinality —
  * known-small relative to the corpus (pairs are LSH-capped upstream)
  * — so each round's shuffles are pinned to an explicit small `width`
  * rather than the session's full shuffle width. With AQE coalescing
  * off engine-wide ([[graft.SessionDefaults]]), full-width tiny
  * stages would pay ~shuffle-partitions task launches per round for
  * rows that fit in a handful of tasks; `width` partitions keyed on
  * the join/group keys keep every per-round exchange exchange-count-
  * minimal AND exchange-width-minimal. On a cluster deploy `width`
  * scales with the executor count, not the corpus.
  */
object Components {

  /** `edges`: two numeric-id columns `i`, `j` (undirected pairs).
    * Returns `(id, component)` for every node appearing in an edge,
    * `component` = min node id reachable.
    *
    * `width`: explicit partition count for the per-round label
    * frames (see object doc). The repartition-before-groupBy trades
    * map-side combine of the (cap-bounded) edge join away for
    * narrow, uniformly-keyed stages — the right trade when rounds
    * are many and rows are few.
    */
  def minLabelComponents(edges: DataFrame, iters: Int = 5,
                         width: Int = 8): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    // Stage the pair list before mirroring it: the two union branches
    // below would otherwise each re-execute the caller's (typically
    // expensive — LSH candidate + verify) edge plan. One cached pass
    // feeds both directions.
    val e = edges.persist()
    val und = e.select($"i".as("a"), $"j".as("b"))
      .unionByName(e.select($"j".as("a"), $"i".as("b")))
      .repartition(width, $"b")
      .persist()
    // Round 1, fused: labels start as the identity, so the first
    // propagation's pointer jump is a no-op and its neighbor-min is
    // a single aggregate over the (symmetric) edges — one narrow
    // exchange replaces the distinct-nodes checkpoint + a full round.
    var labels = und
      .repartition(width, $"a")
      .groupBy($"a").agg(min($"b").as("nbr_min"))
      .select($"a".as("id"), least($"a", $"nbr_min").as("comp"))
      .localCheckpoint(true)
    var round = 1
    var converged = false
    def neighborMin(lbl: DataFrame): DataFrame = und
      .join(lbl.select($"id".as("b"), $"comp".as("nbr_comp")), Seq("b"))
      .repartition(width, $"a")
      .groupBy($"a").agg(min($"nbr_comp").as("nbr_min"))
    while (round < iters && !converged) {
      // one join against the edges (neighbor min) + one join against
      // the labels themselves (pointer jump: comp2 = label(comp));
      // both branches read the same checkpointed `labels`, so the
      // per-round plan stays flat. The OLD label rides along as
      // `prev`, making the convergence probe a join-free scan of the
      // checkpoint instead of a second join per round.
      val next = labels
        .join(neighborMin(labels).select($"a".as("id"), $"nbr_min"),
          Seq("id"), "left")
        .join(labels.select($"id".as("comp"), $"comp".as("comp2")),
          Seq("comp"), "left")
        .select($"id",
          least($"comp", coalesce($"nbr_min", $"comp"),
            coalesce($"comp2", $"comp")).as("comp"),
          $"comp".as("prev"))
        .repartition(width, $"id")
        .localCheckpoint(true)
      labels = next.select($"id", $"comp")
      round += 1
      // convergence probe: one tiny existence scan per round (the q25
      // runtime-check pattern) — rounds stop as soon as labels fix.
      // Round 1 (the fused init) is never probed: any real edge
      // changes its higher endpoint there, so the earliest possible
      // fixed point is round 2.
      converged = next.filter($"comp" =!= $"prev").limit(1).count() == 0
    }
    if (!converged) {
      // one verification round: if anything would still change, the
      // graph's diameter exceeded the doubled schedule — fail loudly
      val unstable = labels
        .join(neighborMin(labels).select($"a".as("id"), $"nbr_min"),
          Seq("id"), "left")
        .filter(coalesce($"nbr_min", $"comp") < $"comp")
        .limit(1).count() > 0
      require(!unstable,
        s"minLabelComponents did not converge in $iters rounds — raise iters")
    }
    und.unpersist()
    e.unpersist()
    labels
  }
}
