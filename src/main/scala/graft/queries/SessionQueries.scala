package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.CoreOps._

/** Event-pipeline additions beyond reference parity: gap-based
  * sessionization (the batch form of session windows), native-
  * expression fingerprint dedup, and cardinality sketching.
  */
object SessionQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Sessionization: a new session starts after a >30-minute gap per
    * user. Classic lag → gap flag → running sum → session aggregate;
    * two window passes over the SAME (user_id, ts) partitioning — one
    * shuffle, then a per-session aggregation.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = ev
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          (unix_micros($"ts") - unix_micros($"prev_ts")) > 30L * 60 * 1000000,
          lit(1)).otherwise(lit(0)))
      .withColumn("session_id", sum($"new_session").over(run))
    flagged.groupBy($"user_id", $"session_id")
      .agg(
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).as("n_events"),
        dsum($"value").as("session_value"),
        countDistinct($"event_type").as("n_event_types"))
      .withColumn("duration_sec",
        (unix_micros($"session_end") - unix_micros($"session_start"))
          .cast("double") / 1e6)
      .orderBy($"user_id", $"session_id")
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT *,
      |    CASE WHEN prev_ts IS NULL
      |           OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |    SELECT user_id, ts, event_id, event_type, value,
      |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events) e) t),
      |sessions AS (
      |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id,
      |  MIN(ts) AS session_start,
      |  MAX(ts) AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS session_value,
      |  COUNT(DISTINCT event_type) AS n_event_types,
      |  CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE) / 1e6 AS duration_sec
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Document fingerprint dedup through the native codegen
    * [[graft.plans.RollingHash64]] expression. Fully oracle-checked:
    * the polynomial kernel (h = h*1000003 + byte, 64-bit wraparound)
    * is mirrored in DuckDB with HUGEINT modular arithmetic over the
    * text's codepoints — identical to UTF-8 bytes because the corpus
    * is ASCII (the oracle would need a byte-level rewrite for
    * multi-byte text).
    */
  def rollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    docs.select($"doc_id",
        graft.plans.NativeFunctions.rollingHash64($"text").as("fingerprint"))
      .groupBy($"fingerprint")
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n"))
      .orderBy($"canonical_id")
  }

  val rollingFingerprintSql: String =
    """WITH fp AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
      |              THEN h - 18446744073709551616::HUGEINT
      |              ELSE h END AS BIGINT) AS fingerprint
      |  FROM (
      |    SELECT doc_id,
      |      list_reduce(
      |        list_prepend(0::HUGEINT,
      |          list_transform(range(1, len(text) + 1), i -> ord(text[i])::HUGEINT)),
      |        (acc, c) -> (acc * 1000003 + c) % 18446744073709551616::HUGEINT) AS h
      |    FROM documents))
      |SELECT fingerprint, MIN(doc_id) AS canonical_id, COUNT(*) AS n
      |FROM fp GROUP BY fingerprint
      |ORDER BY canonical_id""".stripMargin

  /** Cardinality sketching (HLL) beside exact distinct — the approx
    * path an engine needs at 100 TB where countDistinct's shuffle is
    * the bottleneck. Oracle-checked: the sketch estimate itself is
    * engine-specific, so the output carries the exact count plus an
    * `approx_ok` bounded-error boolean (rsd 0.02 ⇒ observed error
    * ≤ 0.6%; the 5% bound is a 2.5σ margin) the oracle asserts TRUE.
    */
  def approxCardinality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    // Two-phase distinct: pre-aggregate to (flag, orderkey) so the
    // exact distinct is a plain count over already-unique keys — no
    // Expand row-duplication (Spark's mixed distinct/non-distinct agg
    // plan), and the second shuffle moves only distinct keys. HLL over
    // the distinct set estimates identically to the multiset (hash
    // dedup is inherent to the sketch).
    li.groupBy($"l_returnflag", $"l_orderkey")
      .agg(count(lit(1)).as("__cnt"))
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("exact_orders"),
        approx_count_distinct($"l_orderkey", 0.02).as("__approx"),
        sum($"__cnt").as("n"))
      .withColumn("approx_ok",
        abs($"__approx" - $"exact_orders").cast("double") /
          $"exact_orders".cast("double") <= 0.05)
      .select($"l_returnflag", $"exact_orders", $"n", $"approx_ok")
      .orderBy($"l_returnflag")
  }

  val approxCardinalitySql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  COUNT(*) AS n,
      |  TRUE AS approx_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q133: ordered conversion funnel view → click → purchase, per
    * user: the product-analytics staple (each stage's timestamp is the
    * EARLIEST event of that type strictly after the previous stage —
    * re-ordering matters: a purchase before the first view does not
    * convert). Three conditional min-aggregates on the same user_id
    * key: stage 1 is a plain groupBy-min; stages 2 and 3 re-join the
    * events on user_id (no broadcast needed — same-key shuffle reuse)
    * and take the min above the previous stage's timestamp. No window
    * over the raw event stream, so per-user event skew never funnels
    * into one sort task.
    *
    * Emits one row per user who reached stage 1, with nullable stage-2
    * and stage-3 timestamps. Only the timestamp is emitted, so
    * MIN(ts) is the whole semantics — ts ties are indistinguishable
    * in the output and need no tie-break (the oracle is plain
    * MIN(ts) too; if a stage ever starts emitting its event_id, an
    * argmin tie-break must land in BOTH engines at once).
    */
  def eventFunnel(s: SparkSession, dir: String): DataFrame =
    eventFunnelCore(Tables.load(s, dir, "events"))

  /** Core over any (user_id, event_type, ts, event_id) events frame —
    * split out so ordering semantics are fixture-testable.
    */
  def eventFunnelCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val ev = events.select($"user_id", $"event_type", $"ts", $"event_id")
    def stageMin(tpe: String, after: DataFrame, afterCol: String): DataFrame =
      ev.filter($"event_type" === tpe)
        .join(after, "user_id")
        .filter($"ts" > col(afterCol))
        .groupBy($"user_id")
        .agg(min($"ts").as(s"${tpe}_ts"))
    val viewed = ev.filter($"event_type" === "view")
      .groupBy($"user_id")
      .agg(min($"ts").as("view_ts"))
    val clicked = stageMin("click", viewed, "view_ts")
    val purchased = stageMin("purchase", clicked, "click_ts")
    viewed
      .join(clicked, Seq("user_id"), "left")
      .join(purchased, Seq("user_id"), "left")
      .select($"user_id", $"view_ts", $"click_ts", $"purchase_ts",
        (lit(1) + when($"click_ts".isNotNull, 1).otherwise(0)
          + when($"purchase_ts".isNotNull, 1).otherwise(0))
          .cast("long").as("stages_reached"))
      .orderBy($"user_id")
  }

  /** The funnel query body WITHOUT its final ORDER BY — shared by the
    * q133 oracle (which appends the ordering) and the q144 latency
    * oracle (which embeds it as a CTE where an inner ORDER BY would
    * be dead weight).
    */
  val eventFunnelSqlBody: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      |  FROM events),
      |v AS (
      |  SELECT user_id, MIN(ts) AS view_ts FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS click_ts
      |  FROM e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.view_ts
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS purchase_ts
      |  FROM e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      |  GROUP BY e.user_id)
      |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
      |  CAST(1 + CASE WHEN c.click_ts IS NULL THEN 0 ELSE 1 END
      |    + CASE WHEN p.purchase_ts IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stages_reached
      |FROM v
      |LEFT JOIN c ON c.user_id = v.user_id
      |LEFT JOIN p ON p.user_id = v.user_id""".stripMargin

  val eventFunnelSql: String = eventFunnelSqlBody + "\nORDER BY v.user_id"

  /** q135: cohort retention — the daily-active triangle every growth
    * dashboard is built on: users are cohorted by first-seen day, and
    * each (cohort_date, day_offset) cell counts the cohort's users
    * active that day. The plan avoids BOTH classic blowups: activity
    * is pre-deduplicated to (user, day) BEFORE the cohort join (so a
    * chatty user contributes one row per day, not per event), and the
    * final cell count is a plain `count(*)` — (user, day) uniqueness
    * plus the single cohort per user makes it exactly the distinct
    * user count with no count-distinct shuffle.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    cohortRetentionCore(Tables.load(s, dir, "events"))

  /** Core over any (user_id, ts) events frame — fixture-testable. */
  def cohortRetentionCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val e = events
      .select($"user_id", to_date($"ts").as("d"))
    val active = e.distinct()
    val cohort = active.groupBy($"user_id").agg(min($"d").as("cohort_date"))
    active.join(cohort, "user_id")
      .select($"cohort_date", datediff($"d", $"cohort_date").cast("long").as("day_offset"))
      .groupBy($"cohort_date", $"day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_date", $"day_offset")
  }

  val cohortRetentionSql: String =
    """WITH e AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      |  FROM events),
      |c AS (SELECT user_id, MIN(d) AS cohort_date FROM e GROUP BY user_id)
      |SELECT c.cohort_date,
      |  CAST(date_diff('day', c.cohort_date, e.d) AS BIGINT) AS day_offset,
      |  COUNT(*) AS n_users
      |FROM e JOIN c USING (user_id)
      |GROUP BY c.cohort_date, day_offset
      |ORDER BY c.cohort_date, day_offset""".stripMargin

  /** q136: winsorized robust statistics per event type — the outlier
    * clamp a metrics pipeline applies before any mean is trusted:
    * per-type p01/p99 (percentile_disc — actual data values, engine-
    * identical), values clipped into [p01, p99], raw and winsorized
    * means from exact decimal sums (order-independent, the dsum
    * discipline). Two passes over events: a 5-row stats aggregate
    * broadcast back onto the scan, then one final aggregate — no
    * window, no sort of the raw stream.
    */
  def winsorizedStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events").select($"event_type", $"value")
    val stats = ev.groupBy($"event_type").agg(
      expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY value)").as("p01"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("p99"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("clipped", least(greatest($"value", $"p01"), $"p99"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        first($"p01").as("p01"),
        first($"p99").as("p99"),
        (dsum($"value") / count(lit(1))).as("mean_raw"),
        (dsum($"clipped") / count(lit(1))).as("mean_winsorized"))
      .orderBy($"event_type")
  }

  val winsorizedStatsSql: String =
    """WITH s AS (
      |  SELECT event_type,
      |    percentile_disc(0.01) WITHIN GROUP (ORDER BY value) AS p01,
      |    percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type, COUNT(*) AS n, s.p01, s.p99,
      |  CAST(SUM(CAST(e.value AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) AS mean_raw,
      |  CAST(SUM(CAST(LEAST(GREATEST(e.value, s.p01), s.p99) AS DECIMAL(30,4))) AS DOUBLE)
      |    / COUNT(*) AS mean_winsorized
      |FROM events e JOIN s USING (event_type)
      |GROUP BY e.event_type, s.p01, s.p99
      |ORDER BY e.event_type""".stripMargin

  /** q138: robust seasonal outlier detection — the monitoring query a
    * 100 TB event stream runs continuously: each (event_type,
    * hour-of-day) cell gets a median + MAD baseline (median absolute
    * deviation — outlier-proof where mean/stddev are poisoned by the
    * very outliers being hunted), and events whose deviation exceeds
    * 3 robust sigmas (|x − med| > 3 × 1.4826 × MAD) are flagged with
    * their robust z-score. Both percentiles are `percentile_disc` —
    * actual data values, engine-identical (the q136 discipline) — and
    * the baseline is two grouped aggregates over the same ≤|types|×24
    * key plus broadcast joins back; no window ever touches the raw
    * stream. At 100 TB the exact per-cell percentile swaps for
    * `approx_percentile` with everything else unchanged.
    */
  def robustOutliers(s: SparkSession, dir: String): DataFrame =
    robustOutliersCore(Tables.load(s, dir, "events"))

  /** Core over any (event_id, ts, event_type, value) frame —
    * fixture-testable.
    */
  def robustOutliersCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val ev = events
      .select($"event_id", $"ts", $"event_type", $"value",
        hour($"ts").cast("long").as("hod"))
    val med = ev.groupBy($"event_type", $"hod")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("med"))
    val base = ev.join(broadcast(med), Seq("event_type", "hod"))
      .withColumn("dev", abs($"value" - $"med"))
      .groupBy($"event_type", $"hod")
      .agg(min($"med").as("med"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)").as("mad"))
    ev.join(broadcast(base), Seq("event_type", "hod"))
      .filter($"mad" > 0 && abs($"value" - $"med") > lit(4.4478) * $"mad")
      .select($"event_id", $"ts", $"event_type", $"hod", $"value",
        $"med", $"mad",
        round(($"value" - $"med") / (lit(1.4826) * $"mad"), 6).as("score"))
      .orderBy($"event_id")
  }

  val robustOutliersSql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
      |    EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hod
      |  FROM events),
      |m AS (
      |  SELECT event_type, hod,
      |    percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
      |  FROM e GROUP BY 1, 2),
      |d AS (
      |  SELECT e.event_type, e.hod, ABS(e.value - m.med) AS dev, m.med
      |  FROM e JOIN m USING (event_type, hod)),
      |b AS (
      |  SELECT event_type, hod, MIN(med) AS med,
      |    percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS mad
      |  FROM d GROUP BY 1, 2)
      |SELECT e.event_id, e.ts, e.event_type, e.hod, e.value, b.med, b.mad,
      |  ROUND((e.value - b.med) / (1.4826 * b.mad), 6) AS score
      |FROM e JOIN b USING (event_type, hod)
      |WHERE b.mad > 0 AND ABS(e.value - b.med) > 4.4478 * b.mad
      |ORDER BY e.event_id""".stripMargin

  /** q139: sequential pattern mining — the per-user event-type
    * transition matrix with row-normalized probabilities and LIFT
    * (the log-free PMI: lift(a→b) = P(a,b) / (P(a·)P(·b)); PMI is its
    * log, and libm log is not engine-reproducible, so the engine
    * emits the exact quantity — same ranking signal). Consecutive
    * pairs come from ONE lead() pass per user (the q49 sessionize
    * partitioning — sequence ops are inherently per-key ordered);
    * everything after operates on the ≤|types|² count matrix:
    * marginals and the total are aggregates OF THE MATRIX, joined
    * back broadcast. Fixed-point arithmetic is exact decimal/HUGEINT
    * ppb (the q131 discipline) — bit-identical on any cluster size.
    */
  def transitionLift(s: SparkSession, dir: String): DataFrame =
    transitionLiftCore(Tables.load(s, dir, "events"))

  /** Core over any (user_id, ts, event_id, event_type) frame —
    * fixture-testable.
    */
  def transitionLiftCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = events.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("dst_event_type", lead($"event_type", 1).over(w))
      .filter($"dst_event_type".isNotNull)
      .select($"event_type".as("src_event_type"), $"dst_event_type")
    val c = pairs.groupBy($"src_event_type", $"dst_event_type")
      .agg(count(lit(1)).as("n"))
    val sm = c.groupBy($"src_event_type").agg(sum($"n").as("n_src"))
    val dm = c.groupBy($"dst_event_type").agg(sum($"n").as("n_dst"))
    val t = c.agg(sum($"n").as("n_tot"))
    c.join(broadcast(sm), "src_event_type")
      .join(broadcast(dm), "dst_event_type")
      .crossJoin(broadcast(t))
      .select($"src_event_type", $"dst_event_type",
        $"n", $"n_src", $"n_dst", $"n_tot",
        expr("cast((cast(n as decimal(38,0)) * 1000000000) div n_src as bigint)")
          .as("p_ppb"),
        expr("""cast((cast(n as decimal(38,0)) * n_tot * 1000000000)
               |     div (cast(n_src as decimal(38,0)) * n_dst) as bigint)"""
          .stripMargin).as("lift_ppb"))
      .orderBy($"src_event_type", $"dst_event_type")
  }

  val transitionLiftSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
      |  FROM events),
      |p AS (
      |  SELECT event_type AS src_event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst_event_type
      |  FROM e),
      |c AS (SELECT src_event_type, dst_event_type, COUNT(*) AS n
      |      FROM p WHERE dst_event_type IS NOT NULL GROUP BY 1, 2),
      |sm AS (SELECT src_event_type, CAST(SUM(n) AS BIGINT) AS n_src FROM c GROUP BY 1),
      |dm AS (SELECT dst_event_type, CAST(SUM(n) AS BIGINT) AS n_dst FROM c GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot FROM c)
      |SELECT c.src_event_type, c.dst_event_type, c.n, sm.n_src, dm.n_dst, t.n_tot,
      |  CAST((CAST(c.n AS HUGEINT) * 1000000000) // sm.n_src AS BIGINT) AS p_ppb,
      |  CAST((CAST(c.n AS HUGEINT) * t.n_tot * 1000000000)
      |       // (CAST(sm.n_src AS HUGEINT) * dm.n_dst) AS BIGINT) AS lift_ppb
      |FROM c
      |JOIN sm USING (src_event_type) JOIN dm USING (dst_event_type) CROSS JOIN t
      |ORDER BY c.src_event_type, c.dst_event_type""".stripMargin

  /** q142: last-touch channel attribution — every purchase is credited
    * to the user's most recent click within a 7-day window, and
    * revenue rolls up per click channel (unattributed purchases land
    * in channel −1, "direct"). The attribution itself is the q12
    * as-of machinery with the BIG side as the probe (purchases ⟵
    * clicks, backward, 7-day tolerance): one key shuffle, one
    * incremental-frame scan — the shape that survives a purchase
    * stream of any size. Revenue shares are exact decimal fixed-point
    * ppb against a broadcast 1-row total.
    */
  def channelAttribution(s: SparkSession, dir: String): DataFrame =
    channelAttributionCore(Tables.load(s, dir, "events"))

  /** Core over any (event_id, ts, user_id, event_type, value, props)
    * frame — fixture-testable.
    */
  def channelAttributionCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val ev = events.withColumn("channel", channel($"props"))
    val clicks = dedupKeepLast(
      ev.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"channel", $"event_id"),
      Seq("c_user", "c_ts"), Seq("event_id"))
      .select($"c_user", $"c_ts", $"channel")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"ts", $"user_id", $"value")
    val attributed = asofJoin(purchases, clicks, "user_id", "c_user",
      "ts", "c_ts", Seq("channel"),
      toleranceSeconds = Some(7L * 24 * 3600))
    val perChannel = attributed
      .groupBy(coalesce($"channel", lit(-1)).cast("long").as("channel_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum($"value".cast("decimal(30,4)")).as("rev"))
    val total = perChannel.agg(sum($"rev").as("tot"))
    perChannel.crossJoin(broadcast(total))
      .select($"channel_id", $"n_purchases",
        $"rev".cast("double").as("revenue"),
        expr("""cast((cast(rev * 10000 as decimal(38,0)) * 1000000000)
               |     div cast(tot * 10000 as decimal(38,0)) as bigint)"""
          .stripMargin).as("share_ppb"))
      .orderBy($"channel_id")
  }

  val channelAttributionSql: String =
    s"""WITH e AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
      |    $channelSqlExpr AS channel
      |  FROM events),
      |c AS (
      |  SELECT c_user, c_ts, channel FROM (
      |    SELECT user_id AS c_user, ts AS c_ts, channel,
      |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM e WHERE event_type = 'click') t WHERE rn = 1),
      |p AS (
      |  SELECT event_id, ts, user_id, value FROM e WHERE event_type = 'purchase'),
      |m AS (
      |  SELECT p.event_id, p.value,
      |    (SELECT c.channel FROM c
      |     WHERE c.c_user = p.user_id AND c.c_ts <= p.ts
      |       AND c.c_ts >= p.ts - INTERVAL 7 DAY
      |     ORDER BY c.c_ts DESC LIMIT 1) AS channel
      |  FROM p),
      |a AS (
      |  SELECT CAST(COALESCE(channel, -1) AS BIGINT) AS channel_id,
      |    COUNT(*) AS n_purchases,
      |    SUM(CAST(value AS DECIMAL(30,4))) AS rev
      |  FROM m GROUP BY 1),
      |t AS (SELECT SUM(rev) AS tot FROM a)
      |SELECT a.channel_id, a.n_purchases, CAST(a.rev AS DOUBLE) AS revenue,
      |  CAST((CAST(a.rev * 10000 AS HUGEINT) * 1000000000)
      |       // CAST(t.tot * 10000 AS HUGEINT) AS BIGINT) AS share_ppb
      |FROM a CROSS JOIN t
      |ORDER BY a.channel_id""".stripMargin

  /** q144: conversion-latency histogram — how long the q133 funnel
    * takes, bucketed into powers-of-2 seconds (the log-scale histogram
    * every latency dashboard wants). The bucket index is
    * floor(log2(max(latency, 1))) computed EXACTLY as
    * `length(bin(x)) − 1` — integer bit-length, no libm log2, and
    * DuckDB's unpadded bin() mirrors it verbatim. One aggregate over
    * the funnel's converter rows (already one row per user); bucket
    * cardinality is ≤ 64 by construction.
    */
  def conversionLatency(s: SparkSession, dir: String): DataFrame =
    conversionLatencyCore(Tables.load(s, dir, "events"))

  /** Core over any events frame — fixture-testable. */
  def conversionLatencyCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    eventFunnelCore(events)
      .filter($"purchase_ts".isNotNull)
      .select(expr("(unix_micros(purchase_ts) - unix_micros(view_ts)) div 1000000")
        .as("lat_s"))
      .withColumn("bucket",
        (length(bin(greatest($"lat_s", lit(1L)))) - 1).cast("long"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_users"),
        min($"lat_s").as("min_s"), max($"lat_s").as("max_s"))
      .withColumn("bucket_lo_s",
        expr("shiftleft(cast(1 as bigint), cast(bucket as int))"))
      .select($"bucket", $"bucket_lo_s", $"n_users", $"min_s", $"max_s")
      .orderBy($"bucket")
  }

  val conversionLatencySql: String = {
    val funnelCte = eventFunnelSqlBody.linesIterator
      .map("  " + _).mkString("\n")
    s"""WITH funnel AS (
       |$funnelCte
       |),
       |lat AS (
       |  SELECT (epoch_us(purchase_ts) - epoch_us(view_ts)) // 1000000 AS lat_s
       |  FROM funnel WHERE purchase_ts IS NOT NULL),
       |b AS (
       |  SELECT lat_s,
       |    CAST(length(bin(GREATEST(lat_s, 1))) - 1 AS BIGINT) AS bucket
       |  FROM lat)
       |SELECT bucket,
       |  CAST(1 AS BIGINT) << CAST(bucket AS INTEGER) AS bucket_lo_s,
       |  COUNT(*) AS n_users, MIN(lat_s) AS min_s, MAX(lat_s) AS max_s
       |FROM b GROUP BY bucket
       |ORDER BY bucket""".stripMargin
  }

  /** q145: trending top-k — per 6-hour tumbling window, the 3 busiest
    * event types with deterministic (count desc, type) tie-break. The
    * per-window ranking is the [[graft.plans.BoundedTopK]] aggregate
    * (≤3 rows per map task survive the shuffle — the q59 discipline),
    * never a row_number window over the counts.
    */
  def trendingTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.BoundedTopK.boundedTopK
    val ev = Tables.load(s, dir, "events")
    val counts = ev
      .groupBy(window($"ts", "6 hours")("start").as("w_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
    counts.groupBy($"w_start")
      .agg(boundedTopK(struct((-$"n").as("negn"), $"event_type", $"n"), 3).as("top"))
      .select($"w_start", posexplode($"top").as(Seq("pos", "r")))
      .select($"w_start", ($"pos" + 1).cast("long").as("rank"),
        $"r.event_type".as("event_type"), $"r.n".as("n"))
      .orderBy($"w_start", $"rank")
  }

  val trendingTopKSql: String =
    """WITH c AS (
      |  SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start, event_type,
      |    COUNT(*) AS n
      |  FROM (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events) e
      |  GROUP BY 1, 2)
      |SELECT w_start, rank, event_type, n FROM (
      |  SELECT *, row_number() OVER (PARTITION BY w_start
      |                               ORDER BY n DESC, event_type) AS rank
      |  FROM c) t
      |WHERE rank <= 3
      |ORDER BY w_start, rank""".stripMargin

  /** q146: behavior correlation matrix — Pearson correlation between
    * every pair of event types over per-user activity counts (do users
    * who click more also buy more?). The statistical kernel is EXACT
    * integer moments: the dense user×type count matrix (zeros
    * included — correlation over sparse counts is wrong without them)
    * is users×|types| rows, the per-user type pairing fans out ≤
    * C(|types|,2), and one hash aggregate collects (n, Σx, Σy, Σxy,
    * Σx², Σy²) as BIGINTs. Only the final Pearson ratio is double —
    * same formula both engines, and IEEE sqrt is correctly rounded, so
    * the result is bit-identical. Zero-variance pairs yield null.
    */
  def behaviorCorrelation(s: SparkSession, dir: String): DataFrame =
    behaviorCorrelationCore(Tables.load(s, dir, "events"))

  /** Core over any (user_id, event_type) frame — fixture-testable. */
  def behaviorCorrelationCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val cnt = events.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("c"))
    val types = events.select($"event_type").distinct()
    val users = events.select($"user_id").distinct()
    val dense = users.crossJoin(broadcast(types))
      .join(cnt, Seq("user_id", "event_type"), "left")
      .select($"user_id", $"event_type", coalesce($"c", lit(0L)).as("c"))
    val a = dense.select($"user_id", $"event_type".as("type_a"), $"c".as("ca"))
    val b = dense.select($"user_id".as("u2"), $"event_type".as("type_b"),
      $"c".as("cb"))
    // moments and their products run in decimal(38,0) (the q139
    // discipline): per-user counts can reach ~1e4 and user counts
    // ~1e9 at the target scale, so n*Σx² ~ 1e24 overflows int64 —
    // Spark would wrap silently while the HUGEINT oracle errors
    val m = a.join(b, $"user_id" === $"u2" && $"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n"),
        sum($"ca".cast("decimal(38,0)")).as("sx"),
        sum($"cb".cast("decimal(38,0)")).as("sy"),
        sum($"ca".cast("decimal(38,0)") * $"cb").as("sxy"),
        sum($"ca".cast("decimal(38,0)") * $"ca").as("sxx"),
        sum($"cb".cast("decimal(38,0)") * $"cb").as("syy"))
    m.select($"type_a", $"type_b", $"n".as("n_users"),
        when($"n" * $"sxx" - $"sx" * $"sx" > 0 &&
             $"n" * $"syy" - $"sy" * $"sy" > 0,
          ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
            (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
             sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double"))))
          .as("corr"))
      .orderBy($"type_a", $"type_b")
  }

  val behaviorCorrelationSql: String =
    """WITH e AS (SELECT user_id, event_type FROM events),
      |cnt AS (SELECT user_id, event_type, COUNT(*) AS c FROM e GROUP BY 1, 2),
      |types AS (SELECT DISTINCT event_type FROM e),
      |users AS (SELECT DISTINCT user_id FROM e),
      |dense AS (
      |  SELECT u.user_id, t.event_type, COALESCE(c.c, 0) AS c
      |  FROM users u CROSS JOIN types t
      |  LEFT JOIN cnt c ON c.user_id = u.user_id AND c.event_type = t.event_type),
      |p AS (
      |  SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
      |    a.c AS ca, b.c AS cb
      |  FROM dense a JOIN dense b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type),
      |m AS (
      |  -- sums and products stay HUGEINT: n*sxx ~ 1e24 at target
      |  -- scale, past int64 (mirrors the engine's decimal(38,0))
      |  SELECT type_a, type_b, COUNT(*) AS n,
      |    SUM(CAST(ca AS HUGEINT)) AS sx, SUM(CAST(cb AS HUGEINT)) AS sy,
      |    SUM(CAST(ca AS HUGEINT) * cb) AS sxy,
      |    SUM(CAST(ca AS HUGEINT) * ca) AS sxx,
      |    SUM(CAST(cb AS HUGEINT) * cb) AS syy
      |  FROM p GROUP BY 1, 2)
      |SELECT type_a, type_b, n AS n_users,
      |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
      |    CAST(n * sxy - sx * sy AS DOUBLE)
      |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
      |  END AS corr
      |FROM m ORDER BY type_a, type_b""".stripMargin

  /** q151: RFM segmentation — the classic customer-value grid: per
    * user, Recency (days since last activity, against the corpus's
    * last day), Frequency (event count), Monetary (exact-decimal
    * purchase total), each mapped to its quartile index with the q149
    * grid discipline: three `percentile_disc` cut points per metric
    * (global aggregates — 9 values total, broadcast), and each user's
    * quartile is the COUNT of cut points ≤ their metric. One
    * user-keyed aggregate over the stream; everything after is
    * per-user arithmetic against broadcast scalars — no window, no
    * second shuffle. The 0–3 indices pack into a 3-digit rfm_code.
    */
  def rfmSegments(s: SparkSession, dir: String): DataFrame =
    rfmSegmentsCore(Tables.load(s, dir, "events"))

  /** Core over any (user_id, ts, event_type, value) frame. */
  def rfmSegmentsCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val perUser = events.groupBy($"user_id").agg(
      max(to_date($"ts")).as("last_day"),
      count(lit(1)).as("frequency"),
      dsum(when($"event_type" === "purchase", $"value")).as("monetary0"))
    val metrics = perUser
      .crossJoin(broadcast(perUser.agg(max($"last_day").as("corpus_last"))))
      .select($"user_id",
        datediff($"corpus_last", $"last_day").cast("long").as("recency_days"),
        $"frequency",
        coalesce($"monetary0", lit(0.0)).as("monetary"))
    val cuts = metrics.agg(
      array((1 to 3).map(q =>
        expr(s"percentile_disc(0.${q * 25}) WITHIN GROUP (ORDER BY recency_days)")): _*)
        .as("rg"),
      array((1 to 3).map(q =>
        expr(s"percentile_disc(0.${q * 25}) WITHIN GROUP (ORDER BY frequency)")): _*)
        .as("fg"),
      array((1 to 3).map(q =>
        expr(s"percentile_disc(0.${q * 25}) WITHIN GROUP (ORDER BY monetary)")): _*)
        .as("mg"))
    metrics.crossJoin(broadcast(cuts))
      .select($"user_id", $"recency_days", $"frequency", $"monetary",
        expr("size(filter(rg, g -> g <= recency_days))").cast("long").as("r_q"),
        expr("size(filter(fg, g -> g <= frequency))").cast("long").as("f_q"),
        expr("size(filter(mg, g -> g <= monetary))").cast("long").as("m_q"))
      .withColumn("rfm_code", $"r_q" * 100 + $"f_q" * 10 + $"m_q")
      .orderBy($"user_id")
  }

  val rfmSegmentsSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_day,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |             THEN CAST(value AS DECIMAL(30,4)) END) AS DOUBLE) AS monetary0
      |  FROM events GROUP BY user_id),
      |m AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', last_day,
      |      (SELECT MAX(last_day) FROM u)) AS BIGINT) AS recency_days,
      |    frequency,
      |    COALESCE(monetary0, 0.0) AS monetary
      |  FROM u),
      |c AS (
      |  SELECT
      |    [percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days),
      |     percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_days),
      |     percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days)] AS rg,
      |    [percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency),
      |     percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency),
      |     percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency)] AS fg,
      |    [percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary),
      |     percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary),
      |     percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary)] AS mg
      |  FROM m)
      |SELECT m.user_id, m.recency_days, m.frequency, m.monetary,
      |  CAST(len(list_filter(c.rg, g -> g <= m.recency_days)) AS BIGINT) AS r_q,
      |  CAST(len(list_filter(c.fg, g -> g <= m.frequency)) AS BIGINT) AS f_q,
      |  CAST(len(list_filter(c.mg, g -> g <= m.monetary)) AS BIGINT) AS m_q,
      |  CAST(len(list_filter(c.rg, g -> g <= m.recency_days)) * 100
      |    + len(list_filter(c.fg, g -> g <= m.frequency)) * 10
      |    + len(list_filter(c.mg, g -> g <= m.monetary)) AS BIGINT) AS rfm_code
      |FROM m CROSS JOIN c
      |ORDER BY m.user_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "q151_rfm_segments" -> (rfmSegments(_, _)),
    "q146_behavior_correlation" -> (behaviorCorrelation(_, _)),
    "q49_sessionize" -> (sessionize(_, _)),
    "q138_robust_outliers" -> (robustOutliers(_, _)),
    "q139_transition_lift" -> (transitionLift(_, _)),
    "q142_channel_attribution" -> (channelAttribution(_, _)),
    "q144_conversion_latency" -> (conversionLatency(_, _)),
    "q145_trending_topk" -> (trendingTopK(_, _)),
    "q135_cohort_retention" -> (cohortRetention(_, _)),
    "q136_winsorized_stats" -> (winsorizedStats(_, _)),
    "q133_event_funnel" -> (eventFunnel(_, _)),
    "q50_rolling_fingerprint" -> (rollingFingerprint(_, _)),
    "q51_approx_cardinality" -> (approxCardinality(_, _)))

  val oracles: Map[String, String] = Map(
    "q49_sessionize" -> sessionizeSql,
    "q138_robust_outliers" -> robustOutliersSql,
    "q139_transition_lift" -> transitionLiftSql,
    "q142_channel_attribution" -> channelAttributionSql,
    "q144_conversion_latency" -> conversionLatencySql,
    "q145_trending_topk" -> trendingTopKSql,
    "q146_behavior_correlation" -> behaviorCorrelationSql,
    "q151_rfm_segments" -> rfmSegmentsSql,
    "q133_event_funnel" -> eventFunnelSql,
    "q135_cohort_retention" -> cohortRetentionSql,
    "q136_winsorized_stats" -> winsorizedStatsSql,
    "q50_rolling_fingerprint" -> rollingFingerprintSql,
    "q51_approx_cardinality" -> approxCardinalitySql)
}
