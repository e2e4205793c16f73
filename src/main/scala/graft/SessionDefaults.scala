package graft

import org.apache.spark.sql.SparkSession

/** Shared local-session hygiene applied by every entry point (tests,
  * [[Verify]], [[Bench]]): Derby — the embedded Hive-metastore
  * database — and the SQL warehouse both live under `target/`, so a
  * test or bench run leaves no `derby.log` / `metastore_db/` /
  * `spark-warehouse/` droppings in the repo root that would
  * eventually be committed by accident. Derby resolves both its log
  * and relative database names against the `derby.system.home` JVM
  * property, so one property covers both artifacts.
  */
object SessionDefaults {
  def apply(b: SparkSession.Builder): SparkSession.Builder = {
    val derby = new java.io.File("target/derby")
    derby.mkdirs()
    System.setProperty("derby.system.home", derby.getAbsolutePath)
    b.config("spark.sql.warehouse.dir",
      new java.io.File("target/spark-warehouse").toURI.toString)
      // The engine's own extensions are on by default in every entry
      // point, exactly as a cluster deploy would set
      // `spark.sql.extensions`: the native SQL functions
      // (trading_day_roll, bounded_top_k, bounded_rank_top_k) resolve,
      // and the rank-limit rewrite turns the SQL row_number idiom into
      // the bounded-heap aggregate — the same plan contract the Column
      // API gets, now also for plain-SQL users of Verify/Bench/tests.
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // AQE's post-shuffle partition COALESCING is off: it merges
      // partitions by shuffle BYTES, which is blind to compute-dense
      // rows — the r14 q134 finding, where a few MB of candidate
      // pairs coalesced to ONE partition and serialized seconds of
      // Levenshtein DP through a single core (and the range-sort's
      // sampling pass ran the single-task join twice). This engine's
      // heavy stages are hash/DP/regex per row, not bytes, so
      // parallelism-first is the right default at every scale; AQE
      // itself (runtime re-plan, skew-join splitting) stays ON.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // Local split sizing: the test/probe parquet is a handful of
      // 10-50 MB files, which at the 128 MB default is ONE split (= one
      // scan task) each — and Spark runs scan-stage expressions,
      // including join-inferred IsNotNull over derived kernel columns,
      // at split parallelism. 8 MB maps these files onto the 32-core
      // box the way a real 100 TB table's thousands of row groups map
      // onto a cluster; on a deploy this knob moves back up with the
      // executor count (SURVEY §4 sizing note).
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
  }
}
