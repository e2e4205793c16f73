package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.CoreOps._

/** OLAP breadth beyond the reference's own operator set (SURVEY §2.4
  * notes these as "absent" in the reference — an engine replacing it
  * still needs them): rollup subtotals, per-group top-k windows,
  * INTERSECT/EXCEPT set ops, trailing range frames, sliding windows,
  * pivot, and discrete multi-quantiles. Every query is
  * DuckDB-oracle-checked.
  */
object OlapQueries {

  type Q = (SparkSession, String) => DataFrame

  /** ROLLUP subtotal hierarchy over the region→nation revenue cube,
    * computed over a PRE-AGGREGATED base: one plain hash aggregation
    * collapses the joined fact rows to the 25 (region, nation) cells,
    * and only those expand ×2 through the rollup (decimal partials
    * re-sum exactly). Group keys carry a grouping level so subtotal
    * rows sort deterministically; dims are null-free, so
    * coalesce('ALL') is unambiguous.
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = Tables.load(s, dir, "customer")
    val nation = Tables.load(s, dir, "nation")
    val region = Tables.load(s, dir, "region")
    val orders = Tables.load(s, dir, "orders")
    val pre = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("__n"),
        sum($"o_totalprice".cast("decimal(30,4)")).as("__rev"))
    pre.rollup($"r_name", $"n_name")
      .agg(
        grouping_id().cast("long").as("gid"),
        sum($"__n").as("n_orders"),
        sum($"__rev").cast("double").as("total_revenue"))
      .select(
        coalesce($"r_name", lit("ALL")).as("r_name"),
        coalesce($"n_name", lit("ALL")).as("n_name"),
        $"gid", $"n_orders", $"total_revenue")
      .orderBy($"gid", $"r_name", $"n_name")
  }

  val rollupRevenueSql: String =
    """SELECT
      |  COALESCE(r_name, 'ALL') AS r_name,
      |  COALESCE(n_name, 'ALL') AS n_name,
      |  CASE WHEN r_name IS NULL THEN 3 WHEN n_name IS NULL THEN 1 ELSE 0 END AS gid,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY gid, r_name, n_name""".stripMargin

  /** Top-3 orders per market segment — the rank/top-k-per-group
    * operation the reference lacks, via [[graft.plans.BoundedTopK]]
    * with the explicit (price desc, key) total order as struct sort
    * keys. The window-function form
    * (`row_number over partitionBy(c_mktsegment)`) shuffles EVERY
    * joined row into ~5 segment tasks and sorts there; the bounded
    * aggregate keeps ≤3 rows per map task, so the shuffle carries
    * ≤3×partitions rows regardless of data size.
    */
  def topPerSegment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.BoundedTopK.boundedTopK
    val customer = Tables.load(s, dir, "customer")
    val orders = Tables.load(s, dir, "orders")
    val joined = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .select($"c_mktsegment", $"o_orderkey", $"o_custkey", $"o_totalprice")
    joined.groupBy($"c_mktsegment")
      .agg(boundedTopK(struct((-$"o_totalprice").as("negp"),
        $"o_orderkey", $"o_custkey", $"o_totalprice"), 3).as("top"))
      .select($"c_mktsegment", posexplode($"top").as(Seq("pos", "r")))
      .select($"c_mktsegment", $"r.o_orderkey", $"r.o_custkey",
        $"r.o_totalprice", ($"pos" + 1).cast("long").as("rank"))
      .orderBy($"c_mktsegment", $"rank")
  }

  val topPerSegmentSql: String =
    """SELECT c_mktsegment, o_orderkey, o_custkey, o_totalprice, rank FROM (
      |  SELECT c.c_mktsegment, o.o_orderkey, o.o_custkey, o.o_totalprice,
      |    row_number() OVER (PARTITION BY c.c_mktsegment
      |                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rank
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) t
      |WHERE rank <= 3
      |ORDER BY c_mktsegment, rank""".stripMargin

  /** INTERSECT / EXCEPT set ops on the customer-activity sets of two
    * years (O5 generalized to true distinct set operators). Both ops
    * plan as hash aggregates + joins on the key — one shuffle each at
    * scale; the union of the three tagged branches shares the two
    * year-scans.
    */
  def activitySetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
    def active(year: Int) = orders
      .filter($"o_orderdate" >= to_timestamp(lit(f"$year-01-01")) &&
        $"o_orderdate" < to_timestamp(lit(f"${year + 1}-01-01")))
      .select($"o_custkey")
    val a = active(1997)
    val b = active(1998)
    val both = a.intersect(b).withColumn("op", lit("both"))
    val onlyA = a.except(b).withColumn("op", lit("only_1997"))
    val onlyB = b.except(a).withColumn("op", lit("only_1998"))
    both.unionByName(onlyA).unionByName(onlyB)
      .groupBy($"op")
      .agg(count(lit(1)).as("n_customers"),
        min($"o_custkey").as("min_key"), max($"o_custkey").as("max_key"))
      .orderBy($"op")
  }

  val activitySetOpsSql: String =
    """WITH a AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'),
      |b AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'),
      |tagged AS (
      |  SELECT o_custkey, 'both' AS op FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
      |  UNION ALL
      |  SELECT o_custkey, 'only_1997' AS op FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
      |  UNION ALL
      |  SELECT o_custkey, 'only_1998' AS op FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a))
      |SELECT op, COUNT(*) AS n_customers, MIN(o_custkey) AS min_key, MAX(o_custkey) AS max_key
      |FROM tagged GROUP BY op ORDER BY op""".stripMargin

  /** Trailing 1-hour RANGE frame per user — event-time range windows
    * (the "events in the preceding interval" interval-join expressed
    * as a frame, which is the single-shuffle plan: no self-join).
    * Order key is epoch micros so the frame bound is numeric on both
    * engines; ties (equal ts) are peers and included together.
    */
  def trailingHourStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .withColumn("tsu", unix_micros($"ts"))
    val w = Window.partitionBy($"user_id").orderBy($"tsu")
      .rangeBetween(-3600L * 1000000, 0)
    ev.select($"event_id", $"user_id", $"ts",
        count(lit(1)).over(w).as("n_trailing_1h"),
        sum($"value".cast("decimal(30,4)")).over(w).cast("double").as("value_trailing_1h"))
      .orderBy($"event_id")
  }

  val trailingHourStatsSql: String =
    """SELECT event_id, user_id, ts,
      |  COUNT(*) OVER w AS n_trailing_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER w AS DOUBLE) AS value_trailing_1h
      |FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value,
      |        epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events) e
      |WINDOW w AS (PARTITION BY user_id ORDER BY tsu
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Sliding (hopping) windows: 1-hour windows every 15 minutes per
    * event type. Spark's `window(ts, "1 hour", "15 minutes")` assigns
    * each row to its 4 covering windows (an Expand — rows × 4, then
    * ONE hash aggregation); the oracle replays the same assignment
    * with an explicit hop index. NOTE: the oracle's `time_bucket`
    * aligns with Spark's 1970-01-01 window origin only because the
    * 15-minute hop divides a day evenly (DuckDB's default origin is
    * 2000-01-03, a whole number of days after the epoch); a hop that
    * does not divide 24h must pass an explicit epoch origin to
    * `time_bucket`.
    */
  def slidingWindowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
    ev.groupBy($"event_type",
        window($"ts", "1 hour", "15 minutes")("start").as("window_start"))
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
      .orderBy($"event_type", $"window_start")
  }

  val slidingWindowAggSql: String =
    """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |assigned AS (
      |  SELECT event_type, value,
      |    time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE AS window_start
      |  FROM e, (SELECT unnest([0,1,2,3]) AS k) k)
      |SELECT event_type, window_start, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value
      |FROM assigned
      |GROUP BY event_type, window_start
      |ORDER BY event_type, window_start""".stripMargin

  /** Pivot: yearly revenue spread over return-flag columns. Spark's
    * `pivot` with an explicit value list compiles to conditional
    * aggregates — one shuffle, no per-value scans — exactly the
    * CASE-sum form the oracle states.
    */
  def pivotRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    li.withColumn("ship_year", year($"l_shipdate").cast("long"))
      .groupBy($"ship_year")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(revenueSum($"l_extendedprice", $"l_discount"))
      .withColumnsRenamed(Map("A" -> "revenue_a", "N" -> "revenue_n", "R" -> "revenue_r"))
      .orderBy($"ship_year")
  }

  val pivotRevenueSql: String =
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |  CAST(SUM(CASE WHEN l_returnflag = 'A'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) AS revenue_a,
      |  CAST(SUM(CASE WHEN l_returnflag = 'N'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) AS revenue_n,
      |  CAST(SUM(CASE WHEN l_returnflag = 'R'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) AS revenue_r
      |FROM lineitem
      |GROUP BY year(l_shipdate)
      |ORDER BY ship_year""".stripMargin

  /** Discrete multi-quantiles per group: percentile_disc picks an
    * actual element (smallest value with cumulative distribution
    * ≥ p), so results are exact and engine-independent — the safe
    * distributed-quantile contract (interpolated quantiles differ in
    * ulps across engines; q55 holds the median case).
    */
  def quantileProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    li.groupBy($"l_returnflag")
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity)").as("p95"),
        min($"l_quantity").as("qmin"),
        max($"l_quantity").as("qmax"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val quantileProfileSql: String =
    """SELECT l_returnflag,
      |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50,
      |  percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75,
      |  percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity) AS p95,
      |  MIN(l_quantity) AS qmin,
      |  MAX(l_quantity) AS qmax,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** The analytic-window function family the reference lacks entirely
    * (§2.5 "absent: rank/dense_rank/lag/lead/ntile"): per-user
    * event-ordered lag/lead deltas, quartile ntile, percent_rank and
    * dense_rank by value. One shuffle on the user key; the partition
    * key is the natural entity, so cardinality scales with data.
    */
  def windowFunctions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events").filter($"event_id" < 5000)
    val byTime = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val byValue = Window.partitionBy($"user_id").orderBy($"value", $"event_id")
    ev.select($"event_id", $"user_id", $"ts", $"value",
        lag($"value", 1).over(byTime).as("prev_value"),
        lead($"value", 1).over(byTime).as("next_value"),
        ntile(4).over(byValue).as("value_quartile"),
        percent_rank().over(byValue).as("value_pct_rank"),
        dense_rank().over(byValue).cast("long").as("value_dense_rank"))
      .orderBy($"event_id")
  }

  val windowFunctionsSql: String =
    """SELECT event_id, user_id, ts, value,
      |  lag(value, 1) OVER t AS prev_value,
      |  lead(value, 1) OVER t AS next_value,
      |  ntile(4) OVER v AS value_quartile,
      |  percent_rank() OVER v AS value_pct_rank,
      |  CAST(dense_rank() OVER v AS BIGINT) AS value_dense_rank
      |FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
      |      FROM events) e
      |WHERE event_id < 5000
      |WINDOW t AS (PARTITION BY user_id ORDER BY ts, event_id),
      |       v AS (PARTITION BY user_id ORDER BY value, event_id)
      |ORDER BY event_id""".stripMargin

  /** CUBE grouping sets over (returnflag, linestatus) with an explicit
    * grouping level. The lattice is computed over a PRE-AGGREGATED
    * base: one plain hash aggregation collapses the table to the ≤6
    * (flag, status) cells, and only those expand ×4 through the cube —
    * decimal sums re-sum exactly, so results equal the direct cube
    * while the Expand never multiplies the fact table (at 100 TB the
    * naive plan quadruples scan output; this one quadruples 6 rows).
    */
  def cubeRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val pre = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("__n"),
        sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1) - $"l_discount".cast("decimal(18,2)"))).as("__rev"))
    pre.cube($"l_returnflag", $"l_linestatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        sum($"__n").as("n"),
        sum($"__rev").cast("double").as("revenue"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("l_returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("l_linestatus"),
        $"gid", $"n", $"revenue")
      .orderBy($"gid", $"l_returnflag", $"l_linestatus")
  }

  val cubeRevenueSql: String =
    """SELECT
      |  COALESCE(l_returnflag, 'ALL') AS l_returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
      |  CAST(CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END
      |     + CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** q119 — Z-order clustering audit: interleave (user bucket,
    * minute-of-day) into the Morton key `CoreOps.zOrderKey` writes
    * layouts by ([[graft.sources.Store.writeZClustered]]), then
    * aggregate per coarse z-cell (key >> 10). Each cell's (a, b)
    * min/max bounds form a small rectangle — the property that lets a
    * two-dimensional range scan prune files via parquet stats on BOTH
    * columns. The oracle replays the five mask-and-shift spread rounds
    * bit-for-bit in DuckDB, so the whole key derivation is
    * hash-checked, not just sampled.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
    val a = pmod(col("user_id"), lit(1024L))
    val b = (hour(col("ts")) * 60 + minute(col("ts"))).cast("long")
    e.select(zOrderKey(a, b).as("z"), a.as("a"), b.as("b"))
      .groupBy(shiftright(col("z"), 10).as("cell"))
      .agg(count(lit(1)).as("n"),
        min("a").as("a_min"), max("a").as("a_max"),
        min("b").as("b_min"), max("b").as("b_max"))
      .orderBy("cell")
  }

  val zorderLayoutSql: String =
    """WITH e AS (
      |  SELECT user_id % 1024 AS a,
      |    EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) * 60
      |      + EXTRACT(minute FROM CAST(ts AS TIMESTAMP)) AS b
      |  FROM events),
      |s1 AS (SELECT a, b,
      |  (a | (a << 16)) & 281470681808895 AS xa,
      |  (b | (b << 16)) & 281470681808895 AS xb FROM e),
      |s2 AS (SELECT a, b,
      |  (xa | (xa << 8)) & 71777214294589695 AS xa,
      |  (xb | (xb << 8)) & 71777214294589695 AS xb FROM s1),
      |s3 AS (SELECT a, b,
      |  (xa | (xa << 4)) & 1085102592571150095 AS xa,
      |  (xb | (xb << 4)) & 1085102592571150095 AS xb FROM s2),
      |s4 AS (SELECT a, b,
      |  (xa | (xa << 2)) & 3689348814741910323 AS xa,
      |  (xb | (xb << 2)) & 3689348814741910323 AS xb FROM s3),
      |s5 AS (SELECT a, b,
      |  (xa | (xa << 1)) & 6148914691236517205 AS xa,
      |  (xb | (xb << 1)) & 6148914691236517205 AS xb FROM s4),
      |z AS (SELECT a, b, (xa | (xb << 1)) >> 10 AS cell FROM s5)
      |SELECT cell, COUNT(*) AS n,
      |  MIN(a) AS a_min, MAX(a) AS a_max,
      |  MIN(b) AS b_min, MAX(b) AS b_max
      |FROM z GROUP BY cell ORDER BY cell""".stripMargin

  val defs: Map[String, Q] = Map(
    "q119_zorder_layout" -> (zorderLayout(_, _)),
    "q58_rollup_revenue" -> (rollupRevenue(_, _)),
    "q59_top_per_segment" -> (topPerSegment(_, _)),
    "q60_activity_set_ops" -> (activitySetOps(_, _)),
    "q61_trailing_hour" -> (trailingHourStats(_, _)),
    "q62_sliding_window" -> (slidingWindowAgg(_, _)),
    "q63_pivot_revenue" -> (pivotRevenue(_, _)),
    "q64_quantile_profile" -> (quantileProfile(_, _)),
    "q69_window_functions" -> (windowFunctions(_, _)),
    "q70_cube_revenue" -> (cubeRevenue(_, _)))

  val oracles: Map[String, String] = Map(
    "q119_zorder_layout" -> zorderLayoutSql,
    "q58_rollup_revenue" -> rollupRevenueSql,
    "q59_top_per_segment" -> topPerSegmentSql,
    "q60_activity_set_ops" -> activitySetOpsSql,
    "q61_trailing_hour" -> trailingHourStatsSql,
    "q62_sliding_window" -> slidingWindowAggSql,
    "q63_pivot_revenue" -> pivotRevenueSql,
    "q64_quantile_profile" -> quantileProfileSql,
    "q69_window_functions" -> windowFunctionsSql,
    "q70_cube_revenue" -> cubeRevenueSql)
}
