package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Scoped lifecycle for the staged (persisted) frames the query cores
  * build internally (the q24 sigs table, q25's capped postings, q156's
  * hashed batch, …).
  *
  * Those persists are load-bearing — each staged frame feeds several
  * consumers that would otherwise recompute a heavy kernel — but their
  * lifecycle is caller-owned: the core returns a LAZY frame, so it
  * cannot unpersist (the blocks would drop before first use). The
  * harness callers (Verify, Bench) clear the cache after every query;
  * an interactive library user composing the same cores would instead
  * accumulate one orphaned cached frame per call. This object closes
  * that gap without changing the harness path:
  *
  *  - cores mark their staging persists with [[staged]] — outside any
  *    scope it is exactly `.persist()` (harness behavior unchanged);
  *  - library callers wrap build + action in [[scoped]] (or the
  *    convenience [[run]]), and every frame staged during the block —
  *    transitively, through any core the block calls — is unpersisted
  *    when the block exits, success or failure.
  *
  * Scopes are per-thread and nest (inner scopes release only their own
  * frames), matching the build-then-materialize shape of interactive
  * use. At warehouse scale the same staging tables are what a pipeline
  * writes between stages; this is the in-session analog with a
  * deterministic release point.
  */
object Staging {

  private val scopes =
    new ThreadLocal[List[collection.mutable.ListBuffer[() => Unit]]] {
      override def initialValue(): List[collection.mutable.ListBuffer[() => Unit]] = Nil
    }

  /** Register a cleanup with the innermost active scope on this
    * thread; NO-OP when none is active (the harness path). For
    * resources `Dataset.unpersist` cannot reach — e.g. the terminal
    * `localCheckpoint` blocks of [[Components.minLabelComponents]],
    * which the cache manager never sees.
    */
  def onScopeExit(cleanup: () => Unit): Unit = scopes.get() match {
    case buf :: _ => buf += cleanup
    case Nil      =>
  }

  /** Persist `ds`; when a [[scoped]] block is active on this thread,
    * register it for release at scope exit. Outside a scope this is
    * exactly `ds.persist()` — the caller-owned lifecycle the harness
    * relies on (clearCache per query) is unchanged.
    */
  def staged[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    onScopeExit(() => ds.unpersist(blocking = false))
    ds
  }

  /** Run `body` under a fresh staging scope: every cleanup it
    * registers (each staged frame's unpersist, checkpoint frees) runs
    * in finally. Returns `body`'s value — which must therefore not be
    * a lazy frame still depending on the staged blocks; materialize
    * inside the scope (that is [[run]]'s shape).
    */
  def scoped[T](body: => T): T = {
    val buf = collection.mutable.ListBuffer.empty[() => Unit]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach { c =>
        // a stopped session must not mask body's result — but only
        // swallow NON-fatal failures: a VM error must propagate, and
        // an interrupt must re-set the thread's interrupt flag
        try c()
        catch {
          case _: InterruptedException => Thread.currentThread().interrupt()
          case scala.util.control.NonFatal(_) => ()
        }
      }
    }
  }

  /** The library entry point: build a frame (its construction may
    * stage internal tables), pin its multi-consumer caches
    * ([[pinCaches]] — the ordered-materialization step), run `action`
    * against it (collect/write/count), release every staged block in
    * finally.
    *
    * {{{
    * val pairs = Staging.run(TextQueries.minhashNearDup(spark, dir))(_.collect())
    * // zero staged blocks remain cached here
    * }}}
    */
  def run[R](build: => DataFrame)(action: DataFrame => R): R =
    scoped { val df = build; pinCaches(df); action(df) }

  /** Cached relations reachable from `df`'s plan — including caches
    * NESTED inside other caches' plans (an `InMemoryRelation` is a
    * LeafNode, so the q113 fp-inside-fpk shape never appears at top
    * level) — as (short cache name, plan occurrences, buffers fully
    * materialized?). Plumbing over `private[sql]` internals lives in
    * [[org.apache.spark.sql.graftshim.CacheShim]].
    */
  def cacheUse(df: DataFrame): Seq[(String, Int, Boolean)] =
    org.apache.spark.sql.graftshim.CacheShim.cacheUse(df)
      .map(c => (c.name, c.occurrences, c.loaded))

  /** Multi-consumer caches that are unmaterialized at build time —
    * the q84-class race precondition: a plan (or a cache build job)
    * schedules its independent stages concurrently, and every stage
    * that loses the cache-build race recomputes the staged kernel
    * from scratch (r15/r16 q84: up to 94 s of duplicated explode CPU,
    * visible only as bimodal cpu_passes). Single-occurrence caches
    * cannot race — exactly one scan node, hence one stage, reads
    * them.
    */
  def unpinnedMultiUse(df: DataFrame): Seq[String] =
    cacheUse(df).collect { case (name, n, loaded) if n >= 2 && !loaded => name }

  /** Ordered materialization, generalized (r16 verdict #4): build
    * every unloaded multi-consumer cache reachable from `df`'s plan —
    * nested ones included — with one Spark job each, dependencies
    * first, BEFORE the consuming action runs. Children-first order is
    * what makes the guarantee hold: independent stages of a SINGLE
    * job also run concurrently (the DAGScheduler submits every stage
    * whose parents are done), so building a parent cache whose own
    * plan reads an unbuilt multi-consumer child would re-create the
    * race inside the pin job itself; with children built first, every
    * build and the final action read only finished caches. This keeps
    * query cores PURE at plan-construction time (the
    * BandCapSpec/JaccardCapSpec zero-jobs contract — a library caller
    * composing frames pays no hidden jobs) while giving the executing
    * layer (Bench, Verify, [[run]]) the deterministic low-CPU mode
    * the per-core blocking-count discipline achieved by hand. Returns
    * the number of caches materialized. RaceDisciplineSpec asserts
    * every SparkEntry query plan is race-free after this call.
    */
  def pinCaches(df: DataFrame): Int =
    org.apache.spark.sql.graftshim.CacheShim.pinMultiUse(df).size
}
