package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.{CachedRDDBuilder, InMemoryRelation, InMemoryTableScanExec}

/** Cache-graph discovery + ordered materialization over `private[sql]`
  * internals (`CachedRDDBuilder` cannot be named outside this
  * package). Semantics and rationale live on the public face,
  * [[graft.operators.Staging]]; this object only holds the plumbing:
  *
  *  - discovery walks the cache-substituted logical plan, all
  *    subquery plans, and — because `InMemoryRelation` is a LeafNode —
  *    recursively the PHYSICAL plan of every discovered cache, where a
  *    staged frame consumed only inside another staged frame lives
  *    (q113's fp-inside-fpk). Physical walks step through
  *    `AdaptiveSparkPlanExec` (a LeafExecNode hiding its subtree).
  *  - pinning builds unloaded multi-consumer caches children-first:
  *    independent stages of even a SINGLE job run concurrently, so a
  *    parent cache building over an unbuilt multi-consumer child
  *    would re-create the race inside the pin job itself.
  */
object CacheShim {

  final case class CacheInfo(name: String, occurrences: Int, loaded: Boolean)

  /** Dense per-call ids keyed on REFERENCE equality —
    * System.identityHashCode is a 31-bit value that may collide for
    * two coexisting builders, which would merge two distinct caches
    * into one graph node (one of them then never pinned).
    */
  private final class Ids {
    private val m = new java.util.IdentityHashMap[CachedRDDBuilder, Integer]
    def apply(b: CachedRDDBuilder): Int = {
      val got = m.get(b)
      if (got != null) got.intValue else { val id = m.size; m.put(b, id); id }
    }
  }

  private def shortName(b: CachedRDDBuilder): String =
    b.cachedName.linesIterator
      .map(_.trim).filter(_.nonEmpty).take(2).mkString(" | ").take(120)

  /** (builder, total occurrences, build-dependency ids) per distinct
    * cache reachable from `df`'s plan, nested caches included. Each
    * parent's physical plan is walked exactly once, so a child
    * consumed twice inside one parent counts twice.
    */
  private def cacheGraph(df: DataFrame): Seq[(Int, CachedRDDBuilder, Int, Set[Int])] = {
    val idOf = new Ids
    val occ = collection.mutable.LinkedHashMap.empty[Int, (CachedRDDBuilder, Int)]
    val deps = collection.mutable.Map.empty[Int, Set[Int]].withDefaultValue(Set.empty)
    def note(b: CachedRDDBuilder): Unit = {
      val k = idOf(b)
      occ(k) = (b, occ.get(k).map(_._2).getOrElse(0) + 1)
    }
    def physicalCaches(root: SparkPlan): Seq[CachedRDDBuilder] = {
      val buf = collection.mutable.Buffer.empty[CachedRDDBuilder]
      def go(p: SparkPlan): Unit =
        (p +: p.subqueriesAll).foreach(_.foreach {
          case s: InMemoryTableScanExec => buf += s.relation.cacheBuilder
          case a: AdaptiveSparkPlanExec => go(a.inputPlan)
          case _ => ()
        })
      go(root)
      buf.toSeq
    }
    val top = df.queryExecution.withCachedData
    (top +: top.subqueriesAll)
      .flatMap(_.collect { case r: InMemoryRelation => r.cacheBuilder })
      .foreach(note)
    var frontier = occ.values.map(_._1).toList
    val visited = collection.mutable.Set.empty[Int]
    while (frontier.nonEmpty) {
      val b = frontier.head; frontier = frontier.tail
      val k = idOf(b)
      if (!visited(k)) {
        visited += k
        val inner = physicalCaches(b.cachedPlan)
        inner.foreach(note)
        deps(k) = deps(k) ++ inner.map(idOf(_)).toSet
        frontier = inner.toList ::: frontier
      }
    }
    occ.toSeq.map { case (k, (b, n)) => (k, b, n, deps(k)) }
  }

  def cacheUse(df: DataFrame): Seq[CacheInfo] =
    cacheGraph(df).map { case (_, b, n, _) =>
      CacheInfo(shortName(b), n, b.isCachedColumnBuffersLoaded)
    }

  /** Build every unloaded multi-consumer cache, dependencies first;
    * returns the built caches' names in build order (callers wanting
    * a count take `.size`; the order is what RaceDisciplineSpec's
    * transitive-deps topology asserts).
    */
  def pinMultiUse(df: DataFrame): Seq[String] = {
    val graph = cacheGraph(df)
    val byId = graph.map { case (k, b, n, d) => k -> ((b, n, d)) }.toMap
    // Readiness must see TRANSITIVE dependencies: a pending cache
    // reached only through a NON-pending intermediate (single-use, or
    // already loaded) still races if the parent builds first — the
    // parent's job computes the intermediate inline, whose
    // independent stages hit the unbuilt grandchild concurrently.
    // Computed as an iterative BFS with a visited set — no
    // path-dependent pruning, so the memoized closure is the same for
    // every caller (a recursive `-- onPath` variant would cache a
    // mid-path-pruned closure and silently reuse it for other roots),
    // and termination holds even on a (never-expected) cyclic graph.
    val closure = collection.mutable.Map.empty[Int, Set[Int]]
    def reach(k: Int): Set[Int] =
      closure.getOrElse(k, {
        var r = Set.empty[Int]
        var frontier = byId(k)._3.toList
        while (frontier.nonEmpty) {
          val d = frontier.head; frontier = frontier.tail
          if (d != k && !r.contains(d)) { r += d; frontier = byId(d)._3.toList ::: frontier }
        }
        closure(k) = r
        r
      })
    val pending = collection.mutable.LinkedHashSet(graph.collect {
      case (k, b, n, _) if n >= 2 && !b.isCachedColumnBuffersLoaded => k
    }: _*)
    val built = collection.mutable.ListBuffer.empty[String]
    while (pending.nonEmpty) {
      val ready = pending.find(k => reach(k).forall(d => !pending.contains(d)))
        .getOrElse(pending.head) // acyclic by construction; defensive
      pending -= ready
      val b = byId(ready)._1
      if (!b.isCachedColumnBuffersLoaded) {
        val rdd = b.cachedColumnBuffers
        rdd.sparkContext.runJob(rdd,
          (it: Iterator[_]) => { while (it.hasNext) it.next(); () })
        built += shortName(b)
      }
    }
    built.toSeq
  }
}
