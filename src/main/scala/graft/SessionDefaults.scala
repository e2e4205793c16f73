package graft

import org.apache.spark.sql.SparkSession

/** Shared session hygiene + the engine's plan-critical defaults,
  * applied by every entry point (tests, [[Verify]], [[Bench]]).
  *
  * Hygiene: Derby — the embedded Hive-metastore database — and the
  * SQL warehouse both live under `target/`, so a test or bench run
  * leaves no `derby.log` / `metastore_db/` / `spark-warehouse/`
  * droppings in the repo root that would eventually be committed by
  * accident. Derby resolves both its log and relative database names
  * against the `derby.system.home` JVM property, so one property
  * covers both artifacts.
  *
  * Plan defaults are DEPLOY-AWARE via the `GRAFT_DEPLOY` env profile
  * ([[profileConfigs]]): the split-size and coalescing knobs that are
  * right for the 32-core bench box would be pathological verbatim on
  * a real cluster (8 MB splits over 100 TB ≈ 12.5M scan tasks), so
  * they are scoped to the `local` profile instead of baked in
  * unconditionally.
  */
object SessionDefaults {

  /** The engine's SQL-conf set for a deploy profile — pure and
    * unit-testable without building a session (SessionDefaultsSpec
    * asserts both profiles).
    *
    * `local` (the default — the bench/test topology):
    *  - AQE's post-shuffle partition COALESCING is off: it merges
    *    partitions by shuffle BYTES, which is blind to compute-dense
    *    rows — the r14 q134 finding, where a few MB of candidate
    *    pairs coalesced to ONE partition and serialized seconds of
    *    Levenshtein DP through a single core (and the range-sort's
    *    sampling pass ran the single-task join twice). This engine's
    *    heavy stages are hash/DP/regex per row, not bytes, so
    *    parallelism-first is the right local default; AQE itself
    *    (runtime re-plan, skew-join splitting) stays ON.
    *  - 8 MB split sizing: the test/probe parquet is a handful of
    *    10–50 MB files, which at the 128 MB default is ONE split (=
    *    one scan task) each — and Spark runs scan-stage expressions,
    *    including join-inferred IsNotNull over derived kernel
    *    columns, at split parallelism. 8 MB maps these files onto
    *    the 32-core box the way a real 100 TB table's thousands of
    *    row groups map onto a cluster (SURVEY §4 sizing note).
    *
    * `cluster`: both knobs are left at Spark's defaults — split size
    * scales with `spark.sql.files.maxPartitionBytes` (128 MB) ×
    * executor count, and AQE coalescing is back on (on real data
    * volumes its byte heuristic and the cluster's parallelism floor
    * are no longer misled by toy file sizes). A deployment that hits
    * the compute-dense-coalescing class anyway should reach for
    * `spark.sql.adaptive.coalescePartitions.minPartitionNum` before
    * disabling coalescing wholesale.
    *
    * Explicit env overrides win over either profile:
    * `GRAFT_MAX_PARTITION_BYTES` → `spark.sql.files.maxPartitionBytes`,
    * `GRAFT_COALESCE` → `spark.sql.adaptive.coalescePartitions.enabled`.
    *
    * The env-map overload reads the PROFILE from the same injected
    * map (`GRAFT_DEPLOY`) as the overrides — a hermetic caller
    * injecting `Map.empty` gets the local default regardless of the
    * ambient process env; the two-arg overload pins the profile
    * explicitly (tests exercising both branches).
    */
  def profileConfigs(): Map[String, String] = profileConfigs(sys.env)

  def profileConfigs(env: Map[String, String]): Map[String, String] =
    profileConfigs(env.getOrElse("GRAFT_DEPLOY", "local"), env)

  def profileConfigs(profile: String,
      env: Map[String, String]): Map[String, String] = {
    // The engine's own extensions are on in every profile, exactly as
    // a cluster deploy would set `spark.sql.extensions`: the native
    // SQL functions (trading_day_roll, bounded_top_k,
    // bounded_rank_top_k) resolve, and the rank-limit rewrite turns
    // the SQL row_number idiom into the bounded-heap aggregate — the
    // same plan contract the Column API gets.
    val base = Map("spark.sql.extensions" -> "graft.plans.GraftExtensions")
    val tuned =
      if (isLocalProfile(profile)) Map(
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
        "spark.sql.files.maxPartitionBytes" -> (8 * 1024 * 1024).toString)
      else Map(
        // Measured (round 16, sf1 probe under this profile): AQE's
        // post-shuffle coalescing is blind to compute-dense rows, and
        // its 1 MB minPartitionSize floor defeats parallelismFirst on
        // small-byte stages — q134's blocked Levenshtein join
        // coalesced to ~1 task and ran 13.3 s vs 1.9 s coalescing-off
        // (2.5 s with this floor). Lowering the floor to 64 KB only
        // binds when totalBytes/defaultParallelism < 1 MB — i.e.
        // exactly the small-byte compute-dense class; a real 100 TB
        // stage's bytes/parallelism is far above either floor, so its
        // coalescing is unchanged. Preferred over the deprecated
        // minPartitionNum, which Spark 4 ignores (measured: no
        // effect), and over disabling coalescing wholesale.
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "65536")
    val overrides = Seq(
      "GRAFT_MAX_PARTITION_BYTES" -> "spark.sql.files.maxPartitionBytes",
      "GRAFT_COALESCE" -> "spark.sql.adaptive.coalescePartitions.enabled",
      "GRAFT_MIN_PARTITION_NUM" ->
        "spark.sql.adaptive.coalescePartitions.minPartitionNum",
      "GRAFT_MIN_PARTITION_SIZE" ->
        "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .flatMap { case (e, k) => env.get(e).map(k -> _) }
    base ++ tuned ++ overrides
  }

  /** The ONE profile-name parse (valid-name set + loud-failure rule)
    * shared by [[profileConfigs]] and [[localProfile]], so the two
    * can never drift apart. Unknown profiles fail LOUDLY (the Bench
    * unknown-query discipline): a typo like GRAFT_DEPLOY=Cluster
    * silently falling back to the bench-box knobs would be exactly
    * the 12.5M-task pathology the profile exists to prevent.
    */
  private def isLocalProfile(profile: String): Boolean = profile match {
    case "local" => true
    case "cluster" => false
    case other => throw new IllegalArgumentException(
      s"GRAFT_DEPLOY must be 'local' or 'cluster', got '$other'")
  }

  /** True iff the deploy profile is `local` — the plan-shape switch
    * behind [[Tables.loadSpreadLocal]]. Same parse (and loud-failure
    * rule) as [[profileConfigs]] via [[isLocalProfile]].
    */
  def localProfile(): Boolean =
    isLocalProfile(sys.env.getOrElse("GRAFT_DEPLOY", "local"))

  def localProfile(profile: String): Boolean = isLocalProfile(profile)

  /** Session master for the entry points: `GRAFT_MASTER` env wins
    * (any Spark master URL), else `local[cpus]`. The value this
    * exists for is `local-cluster[workers,coresEach,memEachMB]` —
    * Spark's own multi-executor test topology: a real standalone
    * master + workers in the driver JVM and one FORKED executor JVM
    * per worker, so every claim local[32] cannot test (one
    * BlockManager per executor, real Netty shuffle + broadcast
    * transport, cross-executor cache misses) executes for real on one
    * box. The caller keeps `spark.sql.shuffle.partitions` /
    * SPARK_GRAFT_CPUS sized to the TOTAL core count either way.
    */
  def master(cpus: String): String = master(cpus, sys.env)

  def master(cpus: String, env: Map[String, String]): String =
    env.getOrElse("GRAFT_MASTER", s"local[$cpus]")

  /** The executor-JVM flags a forked-executor master needs and
    * in-process masters ignore. Mirrors build.sbt's driver-side list
    * (org.apache.spark.launcher.JavaModuleOptions): spark-submit
    * injects these for executors, but local-cluster executors are
    * forked by ExecutorRunner from $SPARK_HOME, which on JDK 17 needs
    * the same --add-opens set, plus this build's classes on the
    * executor classpath (the driver got them from sbt).
    */
  private val executorAddOpens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** Extra session confs a master needs beyond the profile set; empty
    * for in-process masters. For `local-cluster` the executor fork
    * also needs two env vars this JVM cannot set for itself — both
    * validated LOUDLY here (the profile-typo rule): SPARK_HOME (where
    * ExecutorRunner finds the distribution; use
    * tools/mk_local_cluster_home.sh for a writable shim so executor
    * sandboxes land under target/, not /opt/spark) and
    * SPARK_SCALA_VERSION (load-spark-env.sh normally sets it; without
    * it the launcher's classpath builder dies with "Cannot find any
    * build directories").
    */
  def masterConfigs(master: String): Map[String, String] =
    masterConfigs(master, sys.env)

  def masterConfigs(master: String, env: Map[String, String]): Map[String, String] =
    if (!master.startsWith("local-cluster")) Map.empty
    else {
      val missing =
        Seq("SPARK_HOME", "SPARK_SCALA_VERSION").filterNot(env.contains)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"master '$master' forks executor JVMs and needs env " +
          s"${missing.mkString(", ")} — e.g. " +
          "SPARK_HOME=$(tools/mk_local_cluster_home.sh) SPARK_SCALA_VERSION=2.13")
      Map(
        "spark.executor.extraClassPath" ->
          new java.io.File("target/scala-2.13/classes").getAbsolutePath,
        "spark.executor.extraJavaOptions" -> executorAddOpens)
    }

  /** The session's stable full compute width — the target partition
    * count for compute-dense spreads ([[Tables.loadSpread]], the q134
    * block join). `spark.sql.shuffle.partitions` is a STATIC conf the
    * deployment sizes to its executor fleet, unlike
    * `sparkContext.defaultParallelism`, which under dynamic
    * allocation reflects however few executors happen to be
    * registered when the plan is built (a query planned right after
    * startup would bake that floor into its partitioning for its
    * whole run). On the bench/test boxes the two coincide (the entry
    * points pin shuffle.partitions = cores).
    */
  def computeWidth(s: SparkSession): Int =
    s.sessionState.conf.numShufflePartitions

  /** Delete this session's reliable-checkpoint residue, then stop it —
    * the shutdown path for every entry point (Bench, Verify, the
    * probe mains). `spark.cleaner.referenceTracking.cleanCheckpoints`
    * only deletes a superseded checkpoint's files when the driver GCs
    * the RDD reference, so a long-lived driver accumulates loop-round
    * files under `spark.checkpoint.dir` between GCs and keeps the
    * final frames' files forever; this bounds checkpoint-dir growth
    * deterministically at session end. Deletes ONLY the session's own
    * per-app subdirectory (`SparkContext.setCheckpointDir` mints a
    * UUID dir under the configured parent), so concurrent sessions
    * sharing one parent dir are untouched. Hadoop-FS API, not
    * java.io.File: a real deploy's checkpoint dir is a DFS path.
    */
  def stopAndReap(spark: SparkSession): Unit = {
    reapCheckpoints(spark)
    spark.stop()
  }

  def reapCheckpoints(spark: SparkSession): Unit =
    spark.sparkContext.getCheckpointDir.foreach { d =>
      val path = new org.apache.hadoop.fs.Path(d)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(path, true)
      ()
    }

  def apply(b: SparkSession.Builder): SparkSession.Builder = {
    val derby = new java.io.File("target/derby")
    derby.mkdirs()
    System.setProperty("derby.system.home", derby.getAbsolutePath)
    profileConfigs().foldLeft(
      b.config("spark.sql.warehouse.dir",
        new java.io.File("target/spark-warehouse").toURI.toString)
        // Reliable-checkpoint home for [[graft.operators.Checkpoints]]
        // (the cluster profile's executor-loss-tolerant lineage cut —
        // the r18 chaos finding). Valid here because every
        // local-cluster executor shares this filesystem; a multi-NODE
        // deployment overrides it with a DFS path. The cleaner conf
        // lets superseded loop-round checkpoints delete their files
        // once the driver GCs the RDD reference.
        .config("spark.checkpoint.dir",
          new java.io.File("target/checkpoints").toURI.toString)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")) {
      case (bb, (k, v)) => bb.config(k, v)
    }
  }
}
