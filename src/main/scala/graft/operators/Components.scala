package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate PAIR list — the step
  * between pair detection (q24/q25/q26/q34) and actual corpus dedup:
  * group transitively-linked documents into one cluster, elect the
  * min-id member as canonical, keep one row per cluster.
  *
  * Algorithm: iterative min-label propagation — each round every node
  * takes the minimum component label among itself and its neighbors;
  * a component converges once `iters` reaches its diameter. Near-dup
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
  * For adversarial long-path graphs (diameter ≫ iters) the check
  * throws rather than returning a silently-wrong clustering; pointer
  * doubling (label(v) := label(label(v))) would cut rounds to
  * O(log d) and composes with this same loop shape if ever needed.
  */
object Components {

  /** `edges`: two numeric-id columns `i`, `j` (undirected pairs).
    * Returns `(id, component)` for every node appearing in an edge,
    * `component` = min node id reachable.
    */
  def minLabelComponents(edges: DataFrame, iters: Int = 5): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val und = edges.select($"i".as("a"), $"j".as("b"))
      .unionByName(edges.select($"j".as("a"), $"i".as("b")))
      .persist()
    var labels = und.select($"a".as("id")).distinct()
      .withColumn("comp", $"id")
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (round < iters && !converged) {
      val nbrMin = und
        .join(labels.select($"id".as("b"), $"comp".as("nbr_comp")), Seq("b"))
        .groupBy($"a").agg(min($"nbr_comp").as("nbr_min"))
      val next = labels
        .join(nbrMin.select($"a".as("id"), $"nbr_min"), Seq("id"), "left")
        .select($"id",
          least($"comp", coalesce($"nbr_min", $"comp")).as("comp"))
        .localCheckpoint(true)
      // convergence probe: one tiny aggregate per round (the q25
      // existence-check pattern) — rounds stop as soon as labels fix
      val changed = next.join(labels.select($"id", $"comp".as("prev")), Seq("id"))
        .filter($"comp" =!= $"prev").limit(1).count() > 0
      labels = next
      converged = !changed
      round += 1
    }
    if (!converged) {
      // one verification round: if anything would still change, the
      // graph's diameter exceeded iters — fail loudly
      val nbrMin = und
        .join(labels.select($"id".as("b"), $"comp".as("nbr_comp")), Seq("b"))
        .groupBy($"a").agg(min($"nbr_comp").as("nbr_min"))
      val unstable = labels
        .join(nbrMin.select($"a".as("id"), $"nbr_min"), Seq("id"), "left")
        .filter(coalesce($"nbr_min", $"comp") < $"comp")
        .limit(1).count() > 0
      require(!unstable,
        s"minLabelComponents did not converge in $iters rounds — raise iters")
    }
    und.unpersist()
    labels
  }
}
