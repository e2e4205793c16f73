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

  /** Schema-ADAPTIVE events loader. The testdata generator has shipped
    * `events.ts` as both parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read as raw nanos via the legacy conf
    * and truncate to micros, the same truncation DuckDB applies casting
    * TIMESTAMP_NS to TIMESTAMP) and plain `timestamp[us]` (reads as
    * TIMESTAMP_NTZ — cast to the session-TZ type; sessions run UTC so
    * values are identical). Branching on the actual column type keeps
    * both generator vintages loading instead of hard-coding either.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanos vintage
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected nanos-as-long or timestamp)")
    }
  }

  /** Events scan with a PUSHED-DOWN time-range predicate.
    *
    * Filters are applied to the column AS SCANNED — before any type
    * conversion — so `PushedFilters: [GreaterThanOrEqual(ts,...)]`
    * lands in the parquet scan. For the nanos vintage that means a
    * raw-nanos BIGINT literal; for the native-timestamp vintage a
    * timestamp literal pushes down directly. At 100 TB
    * (date-partitioned events) this is the difference between pruning
    * at the source and scanning everything.
    */
  def eventsInRange(spark: SparkSession, dir: String,
      startInclusive: String, endExclusive: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def norm(s: String) =
      s.replace("T", " ") + (if (s.length == 10) " 00:00:00" else "")
    def nanos(s: String) =
      java.sql.Timestamp.valueOf(norm(s)).getTime * 1000000L
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= nanos(startInclusive) && col("ts") < nanos(endExclusive))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.filter(col("ts") >= lit(norm(startInclusive)).cast(TimestampNTZType) &&
            col("ts") < lit(norm(endExclusive)).cast(TimestampNTZType))
          .withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        raw.filter(col("ts") >= lit(norm(startInclusive)).cast(TimestampType) &&
          col("ts") < lit(norm(endExclusive)).cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected nanos-as-long or timestamp)")
    }
  }

  /** Fail-fast guard against testdata drift: load every table and name
    * any column whose LOGICAL type is not what the operators were built
    * against. One log line here beats 39 queries dying at analysis —
    * the exact failure mode of the Aug-13 regeneration, where
    * `events.ts` silently changed parquet physical type. [[Verify]]
    * runs this before dumping queries.
    */
  def assertSchemas(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.types._
    // Acceptable LOGICAL types per load-bearing column, post-loader.
    // Timestamp-ish columns accept NTZ or LTZ (both compare identically
    // under the UTC session); events.ts must be LTZ — that is the
    // loader's output contract regardless of the parquet vintage.
    val tsish: Set[DataType] = Set(TimestampType, TimestampNTZType, DateType)
    val expected: Map[String, Map[String, Set[DataType]]] = Map(
      "events" -> Map("ts" -> Set(TimestampType), "event_id" -> Set(LongType),
        "user_id" -> Set(LongType), "value" -> Set(DoubleType),
        "event_type" -> Set(StringType), "props" -> Set(StringType)),
      "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
        "lang" -> Set(StringType), "source" -> Set(StringType)),
      "embeddings" -> Map("vec_id" -> Set(LongType),
        "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
        "label" -> Set(IntegerType)),
      "lineitem" -> Map("l_orderkey" -> Set(LongType),
        "l_quantity" -> Set(DoubleType), "l_shipdate" -> tsish),
      "orders" -> Map("o_orderkey" -> Set(LongType), "o_orderdate" -> tsish))
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      try {
        val schema = load(spark, dir, table).schema
        cols.flatMap { case (name, want) =>
          schema.fields.find(_.name == name) match {
            case None => Some(s"$table.$name: MISSING (have: ${schema.fieldNames.mkString(",")})")
            case Some(f) if !want(f.dataType) =>
              Some(s"$table.$name: expected one of ${want.mkString("/")}, got ${f.dataType}")
            case _ => None
          }
        }
      } catch { case e: Throwable =>
        Seq(s"$table: failed to load: ${e.getMessage}")
      }
    }
    if (problems.nonEmpty)
      sys.error("[schema-guard] testdata drift detected:\n  " + problems.mkString("\n  "))
  }

  /** Load and spread across [[SessionDefaults.computeWidth]] (the
    * configured shuffle width — a static conf, deliberately NOT the
    * registration-timing-dependent defaultParallelism). The test files
    * are single-row-group parquet (one scan task); compute-dense
    * pipelines (UDF kernels, pairwise similarity, regex) must
    * redistribute or they run single-threaded. On a cluster the same
    * call spreads a small dimension scan before a CPU-bound stage —
    * the standard pattern; I/O-bound queries skip it (the shuffle
    * isn't free).
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name).repartition(SessionDefaults.computeWidth(spark))

  /** Deploy-aware spread for compute that is dense only RELATIVE TO A
    * DEGENERATE SCAN WIDTH — the decimal moment aggregates of the
    * relational family (~100 ns/row: trivial at cluster scan
    * parallelism, but the toy single-row-group files serialize the
    * whole partial aggregate onto one core). In the `local` profile
    * this spreads like [[loadSpread]]; in the `cluster` profile it is
    * the plain scan — real tables split by row group, and a
    * round-robin of the raw rows before a partial-aggregable groupBy
    * would ADD a full-table shuffle to the 100 TB plan. Kernels that
    * are expensive per row at ANY width (text/similarity pipelines)
    * keep using [[loadSpread]] unconditionally.
    */
  def loadSpreadLocal(spark: SparkSession, dir: String, name: String,
      spread: Boolean = SessionDefaults.localProfile()): DataFrame =
    if (spread) loadSpread(spark, dir, name)
    else load(spark, dir, name)

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
