package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.CoreOps._

/** Additional analytic shapes: decorrelated scalar subqueries,
  * discrete medians, and rolling-window statistics — standard
  * warehouse analytics the engine supports beyond the reference's
  * own surface.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Correlated scalar subquery, decorrelated: suppliers whose
    * balance exceeds their nation's average. Expressed as the
    * aggregate-then-join plan Catalyst would decorrelate to — one
    * shuffle for the per-nation aggregate (tiny), broadcast back.
    */
  def aboveAvgSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.load(s, dir, "supplier")
    val nationAvg = sup.groupBy($"s_nationkey")
      .agg(davg($"s_acctbal").as("nation_avg"))
    sup.join(broadcast(nationAvg), "s_nationkey")
      .filter($"s_acctbal" > $"nation_avg")
      .select($"s_suppkey", $"s_name", $"s_nationkey", $"s_acctbal", $"nation_avg")
      .orderBy($"s_suppkey")
  }

  val aboveAvgSuppliersSql: String =
    """WITH na AS (
      |  SELECT s_nationkey,
      |    CAST(SUM(CAST(s_acctbal AS DECIMAL(30,6))) AS DOUBLE)
      |      / CAST(COUNT(s_acctbal) AS DOUBLE) AS nation_avg
      |  FROM supplier GROUP BY s_nationkey)
      |SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal, na.nation_avg
      |FROM supplier s JOIN na ON s.s_nationkey = na.s_nationkey
      |WHERE s.s_acctbal > na.nation_avg
      |ORDER BY s.s_suppkey""".stripMargin

  /** Discrete median (element pick — no interpolation, so the value
    * is a datum and bit-identical on any engine) plus row count per
    * group, as a `percentile_disc` AGGREGATE: partial aggregation
    * keeps a per-value count map (l_quantity has bounded cardinality)
    * instead of sorting each group's full row set through one task —
    * the previous row_number-over-3-partitions window plan was a
    * scale-killer at 100 TB (the whole table funneled into ≤3 tasks).
    */
  def discreteMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    li.groupBy($"l_returnflag")
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
          .as("median_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  val discreteMedianSql: String =
    """SELECT l_returnflag,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Approximate-quantile sketch beside exact discrete quantiles —
    * the t-digest-style path an engine needs when even the
    * percentile_disc count map is too wide (high-cardinality value
    * domains at 100 TB). Sketch estimates are engine-specific, so the
    * output carries the exact values plus a bounded-error boolean the
    * oracle asserts TRUE (tolerance one quantity unit — generous for
    * accuracy 10000 on this domain).
    */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    li.groupBy($"l_returnflag")
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("__a50"),
        expr("approx_percentile(l_quantity, 0.9, 10000)").as("__a90"),
        count(lit(1)).as("n"))
      .withColumn("approx_ok",
        abs($"__a50" - $"p50") <= 1.0 && abs($"__a90" - $"p90") <= 1.0)
      .select($"l_returnflag", $"p50", $"p90", $"n", $"approx_ok")
      .orderBy($"l_returnflag")
  }

  val approxQuantilesSql: String =
    """SELECT l_returnflag,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50,
      |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90,
      |  COUNT(*) AS n,
      |  TRUE AS approx_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Rolling-window statistics: 5-row trailing moving average and
    * moving max of event values per user — the bar-smoothing
    * operation every market pipeline needs; decimal-sum
    * deterministic.
    */
  def movingAverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events").filter($"event_id" < 2000)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-4, Window.currentRow)
    ev.select(
        $"event_id", $"user_id", $"ts", $"value",
        (sum($"value".cast("decimal(30,6)")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("ma5"),
        max($"value").over(w).as("max5"),
        count(lit(1)).over(w).as("n_window"))
      .orderBy($"event_id")
  }

  val movingAverageSql: String =
    """SELECT event_id, user_id, ts, value,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE)
      |    / CAST(COUNT(*) OVER w AS DOUBLE) AS ma5,
      |  MAX(value) OVER w AS max5,
      |  COUNT(*) OVER w AS n_window
      |FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events) e
      |WHERE event_id < 2000
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Set intersection (O5): customers active in BOTH the first and
    * last order years — two semi-joins, the engine's INTERSECT path.
    */
  def commonCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
    val early = orders.filter(year($"o_orderdate") === 1995).select($"o_custkey")
    val late = orders.filter(year($"o_orderdate") === 2001).select($"o_custkey")
    val customer = Tables.load(s, dir, "customer")
    customer
      .join(early, customer("c_custkey") === early("o_custkey"), "left_semi")
      .join(late, customer("c_custkey") === late("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val commonCustomersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995)
      |  AND c_custkey IN (SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 2001)
      |ORDER BY c_custkey""".stripMargin

  val defs: Map[String, Q] = Map(
    "q35_approx_quantiles" -> (approxQuantiles(_, _)),
    "q54_above_avg_suppliers" -> (aboveAvgSuppliers(_, _)),
    "q55_discrete_median" -> (discreteMedian(_, _)),
    "q56_moving_average" -> (movingAverage(_, _)),
    "q57_common_customers" -> (commonCustomers(_, _)))

  val oracles: Map[String, String] = Map(
    "q35_approx_quantiles" -> approxQuantilesSql,
    "q54_above_avg_suppliers" -> aboveAvgSuppliersSql,
    "q55_discrete_median" -> discreteMedianSql,
    "q56_moving_average" -> movingAverageSql,
    "q57_common_customers" -> commonCustomersSql)
}
