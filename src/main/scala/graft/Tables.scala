package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned-parquet directory scans; the
  * API shape (dir + logical name) stays identical, so every operator in
  * this library is written against the loader, never a concrete path.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and truncate to
    * microseconds — the same truncation DuckDB applies casting its
    * TIMESTAMP_NS to TIMESTAMP — so both engines see identical values.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Events scan with a PUSHED-DOWN time-range predicate.
    *
    * The public `ts` column is derived (nanos → micros), so filters on
    * it cannot reach the parquet reader; this helper filters the RAW
    * nanos column first — `PushedFilters: [GreaterThanOrEqual(ts,...)]`
    * lands in the scan — then converts. At 100 TB (date-partitioned
    * events) this is the difference between pruning at the source and
    * scanning everything.
    */
  def eventsInRange(spark: SparkSession, dir: String,
      startInclusive: String, endExclusive: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def nanos(s: String) =
      java.sql.Timestamp.valueOf(s.replace("T", " ") + (if (s.length == 10) " 00:00:00" else ""))
        .getTime * 1000000L
    spark.read.parquet(s"$dir/events.parquet")
      .filter(col("ts") >= nanos(startInclusive) && col("ts") < nanos(endExclusive))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Load and spread across the default parallelism. The test files
    * are single-row-group parquet (one scan task); compute-dense
    * pipelines (UDF kernels, pairwise similarity, regex) must
    * redistribute or they run single-threaded. On a cluster the same
    * call spreads a small dimension scan before a CPU-bound stage —
    * the standard pattern; I/O-bound queries skip it (the shuffle
    * isn't free).
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
