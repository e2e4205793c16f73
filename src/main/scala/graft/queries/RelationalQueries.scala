package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.CoreOps._

/** Relational operator coverage (SURVEY §2.1 scans/sinks, §2.3 joins,
  * §2.4 aggregations, §2.6 sorts/limits/set-ops) expressed over the
  * driver test tables, each with a DuckDB oracle.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1/A5-style grouped aggregation (TPC-H Q1 shape) — the reference's
    * resample agg-map semantics (utils.py:303-399) applied to a plain
    * group key instead of a time bucket. Filter is pushed to the scan.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // loadSpreadLocal: the eight decimal moment sums ride the scan as
    // the partial aggregate; on the toy single-row-group layout that
    // serializes them onto one core (profiled: 1.0 s of the query's
    // 1.2 s in a 3-task scan stage). Identity on a cluster deploy.
    Tables.loadSpreadLocal(s, dir, "lineitem")
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        revenueSum($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        sum(money($"l_extendedprice") * (lit(1) - money($"l_discount")) *
          (lit(1) + money($"l_tax"))).cast("double").as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** J1 — left enrichment join preserving the complete-timeline side
    * (v2.py:724-738 quote⟕ohlc): every order kept, lineitem detail
    * aggregated per order, misses filled with 0 like the reference's
    * `fillna(0)` (utils.py:359-392).
    * Plan note: join key = l_orderkey, the natural shuffle key; at
    * scale both sides arrive hash-partitioned on it and AQE can pick
    * shuffled-hash over sort-merge.
    */
  def orderFulfillment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
    // loadSpreadLocal: the per-order decimal partial agg rides the
    // scan (see pricingSummary) — spread on the toy layout only
    val items = Tables.loadSpreadLocal(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        revenueSum($"l_extendedprice", $"l_discount").as("revenue"),
        count(lit(1)).as("n_items"))
    orders.join(items, orders("o_orderkey") === items("l_orderkey"), "left")
      .select(
        $"o_orderkey", $"o_orderdate", $"o_orderstatus", $"o_totalprice",
        coalesce($"sum_qty", lit(0.0)).as("sum_qty"),
        coalesce($"revenue", lit(0.0)).as("revenue"),
        coalesce($"n_items", lit(0L)).as("n_items"))
      .orderBy($"o_orderkey")
  }

  val orderFulfillmentSql: String =
    """SELECT o.o_orderkey, o.o_orderdate, o.o_orderstatus, o.o_totalprice,
      |  COALESCE(i.sum_qty, 0.0) AS sum_qty,
      |  COALESCE(i.revenue, 0.0) AS revenue,
      |  COALESCE(i.n_items, 0) AS n_items
      |FROM orders o
      |LEFT JOIN (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |    COUNT(*) AS n_items
      |  FROM lineitem GROUP BY l_orderkey) i
      |ON o.o_orderkey = i.l_orderkey
      |ORDER BY o.o_orderkey""".stripMargin

  /** Multi-way dim join with broadcast (J4-style lookup chain):
    * customer→nation→region plus an aggregate. nation/region are tiny
    * dims — explicitly broadcast so the plan is two broadcast-hash
    * joins and ONE shuffle (the groupBy), which is the 100 TB plan.
    */
  def revenueByRegion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = Tables.load(s, dir, "customer")
    val nation = Tables.load(s, dir, "nation")
    val region = Tables.load(s, dir, "region")
    val orders = Tables.load(s, dir, "orders")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        dsum($"o_totalprice").as("total_revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"r_name", $"n_name")
  }

  val revenueByRegionSql: String =
    """SELECT r.r_name, n.n_name,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o.o_custkey) AS n_customers
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name
      |ORDER BY r.r_name, n.n_name""".stripMargin

  /** J5/O5 — anti-join set difference (db_management.py:186-228 env
    * diff): customers with no orders. Broadcast-able at dim scale;
    * left_anti avoids materializing the null-extended rows.
    */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = Tables.load(s, dir, "customer")
    val recent = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" >= to_timestamp(lit("2000-01-01")))
      .select($"o_custkey")
    customer.join(recent, customer("c_custkey") === recent("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** O1/O2 — top-k with ordered limit (TPC-H Q3 shape). The sort runs
    * after aggregation on already-reduced data; Spark turns
    * orderBy+limit into TakeOrderedAndProject (no global sort).
    */
  def topRevenueOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
    // loadSpreadLocal: the per-order decimal partial agg rides the
    // scan (see pricingSummary) — spread on the toy layout only
    val li = Tables.loadSpreadLocal(s, dir, "lineitem")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(revenueSum($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val topRevenueOrdersSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** K2 — INSERT-IGNORE upsert semantics (SQLHelpers.py:651-687) as a
    * pure query: new rows = incoming − existing on the key, result =
    * existing ∪ new. Modeled as: orders from 1999+ are "incoming",
    * pre-1999 are "existing"; keys overlapping are ignored.
    * At scale this is the left_anti + append pattern that replaces the
    * temp-table INSERT IGNORE.
    */
  def insertIgnoreUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
    val existing = orders.filter($"o_orderdate" < to_timestamp(lit("1999-01-01")))
    val incoming = orders.filter($"o_custkey" % 3 === 0)
    val newRows = incoming.join(existing.select($"o_orderkey".as("k")),
      incoming("o_orderkey") === col("k"), "left_anti")
    existing.unionByName(newRows)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  val insertIgnoreUpsertSql: String =
    """WITH existing AS (
      |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'),
      |incoming AS (
      |  SELECT * FROM orders WHERE o_custkey % 3 = 0),
      |merged AS (
      |  SELECT * FROM existing
      |  UNION ALL
      |  SELECT * FROM incoming WHERE o_orderkey NOT IN (SELECT o_orderkey FROM existing))
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total
      |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** K3 — dynamic batch UPDATE as a table rewrite
    * (SQLHelpers.py:689-776): reprioritize old open orders, then
    * aggregate the updated table.
    */
  def batchUpdateQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
    val updated = graft.sources.Store.batchUpdate(orders,
      $"o_orderstatus" === "O" && $"o_orderdate" < to_timestamp(lit("1997-01-01")),
      Map("o_orderpriority" -> lit("5-LOW")))
    updated.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderpriority")
  }

  val batchUpdateSql: String =
    """SELECT CASE WHEN o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1997-01-01'
      |            THEN '5-LOW' ELSE o_orderpriority END AS o_orderpriority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** K4 — filtered DELETE as the complement rewrite
    * (SQLHelpers.py:251-358): purge discounted returned lines, then
    * summarize the surviving table.
    */
  def filteredDeleteQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val remaining = graft.sources.Store.filteredDelete(li,
      $"l_returnflag" === "A" && $"l_discount" > 0.05)
    remaining.groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val filteredDeleteSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE NOT (l_returnflag = 'A' AND l_discount > 0.05)
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Semi-join (EXISTS) — customers WITH at least one high-value
    * recent order, plus an intersect-style set op on their segments
    * (J5/O5 complement to q04's anti-join).
    */
  def customersWithBigOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = Tables.load(s, dir, "customer")
    val big = Tables.load(s, dir, "orders")
      .filter($"o_totalprice" > 300000.0)
      .select($"o_custkey")
    customer.join(big, customer("c_custkey") === big("o_custkey"), "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_balance"))
      .orderBy($"c_mktsegment")
  }

  val customersWithBigOrdersSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS total_balance
      |FROM customer
      |WHERE EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  val defs: Map[String, Q] = Map(
    "q01_pricing_summary" -> (pricingSummary(_, _)),
    "q02_order_fulfillment" -> (orderFulfillment(_, _)),
    "q03_revenue_by_region" -> (revenueByRegion(_, _)),
    "q04_customers_without_orders" -> (customersWithoutOrders(_, _)),
    "q05_top_revenue_orders" -> (topRevenueOrders(_, _)),
    "q06_insert_ignore_upsert" -> (insertIgnoreUpsert(_, _)),
    "q07_batch_update" -> (batchUpdateQ(_, _)),
    "q08_filtered_delete" -> (filteredDeleteQ(_, _)),
    "q09_semi_join_exists" -> (customersWithBigOrders(_, _)))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> pricingSummarySql,
    "q02_order_fulfillment" -> orderFulfillmentSql,
    "q03_revenue_by_region" -> revenueByRegionSql,
    "q04_customers_without_orders" -> customersWithoutOrdersSql,
    "q05_top_revenue_orders" -> topRevenueOrdersSql,
    "q06_insert_ignore_upsert" -> insertIgnoreUpsertSql,
    "q07_batch_update" -> batchUpdateSql,
    "q08_filtered_delete" -> filteredDeleteSql,
    "q09_semi_join_exists" -> customersWithBigOrdersSql)
}
