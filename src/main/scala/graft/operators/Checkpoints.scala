package graft.operators

import org.apache.spark.sql.Dataset

/** Deploy-aware lineage cut for the engine's bounded loop/training
  * frames (the [[Components]] round frames, the k-means/PQ training
  * frames, the token-budget bucket table).
  *
  * These frames MUST materialize with truncated lineage — a persist
  * alone leaves the iterative plan doubling per round, and training
  * samples must freeze so a recompute can never silently diverge
  * mid-query. But HOW they materialize is a deploy decision, and the
  * r18 chaos probe measured why: `localCheckpoint` stores its blocks
  * on whichever executors computed them, replication 1, with lineage
  * GONE — so one lost executor JVM makes the block unrecoverable and
  * aborts the whole job ([CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND] on
  * q160's training frame under a deliberate mid-query executor kill,
  * CHAOS_r18.md). On a 1000-executor fleet an executor loss is a
  * weekly event, not a chaos experiment.
  *
  *  - remote-executor masters (`local-cluster`, standalone, YARN,
  *    K8s — `sparkContext.isLocal == false`): RELIABLE `checkpoint`
  *    — files under `spark.checkpoint.dir` ([[SessionDefaults]]
  *    defaults it to target/checkpoints for the shared-filesystem
  *    local-cluster topology; a multi-node deploy sets a DFS path).
  *    Any executor can read them, any loss is survivable. The frames
  *    are bounded by construction (edge-sized loop rounds, ≤100k-row
  *    training samples), so the file I/O is corpus-size-independent.
  *  - in-process masters (`local[n]`): `localCheckpoint` — the
  *    driver JVM cannot lose an executor, so the memory-speed path
  *    is safe exactly where it is used.
  *
  * The switch is the MASTER (a runtime fact), not the GRAFT_DEPLOY
  * planner profile: a cluster-profile bench on local[32] would
  * otherwise pay real file I/O against a risk that structurally
  * cannot occur, and a local-profile run on a real fleet would carry
  * the unrecoverable-block hole.
  */
object Checkpoints {

  /** Materialization mode, overridable for measurement and for
    * deployments that prefer a different durability/latency point
    * (`GRAFT_CHECKPOINT`, loud on typos — the profile rule):
    *
    *  - `auto` (default): reliable files on remote-executor masters,
    *    `localCheckpoint` in-process — the r18 chaos finding.
    *  - `reliable` / `local`: force one path on any master. `local`
    *    under a real fleet reintroduces the unrecoverable-block hole
    *    — it exists for the SCALE_PROBE A/B that prices the reliable
    *    path's file I/O, not for production.
    *  - `local2`: `localCheckpoint` at `MEMORY_AND_DISK_2` — the
    *    replication-2 middle rung: survives any SINGLE executor loss
    *    (a peer holds the replica) at memory speed, without files;
    *    two overlapping losses still abort, which reliable files
    *    never do.
    */
  private def mode: String = sys.env.getOrElse("GRAFT_CHECKPOINT", "auto")

  def stable[T](ds: Dataset[T]): Dataset[T] = mode match {
    case "auto" => stable(ds, !ds.sparkSession.sparkContext.isLocal)
    case "reliable" => stable(ds, reliable = true)
    case "local" => stable(ds, reliable = false)
    case "local2" => ds.localCheckpoint(eager = true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2)
    case other => throw new IllegalArgumentException(
      s"GRAFT_CHECKPOINT must be auto|reliable|local|local2, got '$other'")
  }

  def stable[T](ds: Dataset[T], reliable: Boolean): Dataset[T] =
    if (!reliable) ds.localCheckpoint(eager = true)
    else if (ds.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      // caller already persisted this plan — the checkpoint write job
      // reads those blocks, and they stay the CALLER'S to drop:
      // CacheManager is plan-keyed, so the scaffolding unpersist below
      // would silently evict the caller's cache along with ours
      ds.checkpoint(eager = true)
    else {
      // RDD.checkpoint's documented contract: the checkpoint WRITE is
      // a SEPARATE job that re-runs the RDD's lineage, so an eager
      // reliable checkpoint without a prior persist computes every
      // frame TWICE (materialize job + write job). Persisting first
      // makes the write job read the cached blocks — the pattern
      // Spark's own RDD.checkpoint scaladoc recommends. The cache is
      // scaffolding for that one write: the returned Dataset reads
      // the checkpoint FILES (its plan is a flat LogicalRDD over the
      // reliable-checkpoint RDD), so the source cache is dropped
      // immediately after materialization. CheckpointsSpec counts the
      // per-row evaluations to pin single-compute.
      ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try ds.checkpoint(eager = true)
      finally ds.unpersist(blocking = false)
    }

  /** Eagerly free a SUPERSEDED checkpoint's cached blocks (the
    * [[Components]] loop discipline, shared with [[BpeTrainer]]):
    * a checkpointed Dataset's plan is a `LogicalRDD` over the
    * materialized internal RDD, and `Dataset.unpersist` only consults
    * the cache manager (it ignores checkpoint storage), so without
    * this each loop round's frame lingers until driver GC. Under
    * RELIABLE checkpoints the data lives as files —
    * `spark.cleaner.referenceTracking.cleanCheckpoints` deletes them
    * on driver GC, [[graft.SessionDefaults.stopAndReap]] bounds the
    * residue at session end, and this unpersist is a harmless no-op.
    * Non-blocking: freeing is advisory, never on the critical path.
    */
  def free(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
