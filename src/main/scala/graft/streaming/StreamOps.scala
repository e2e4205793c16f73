package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming restatement of the reference's realtime
  * surface (SURVEY §2.10).
  *
  * The reference has no true streaming — "realtime" is polled snapshot
  * queries (v2.py:456-524) with keep-last dedup as the only late-data
  * semantics (utils.py:684-690). Here that becomes:
  *
  *  - T3: `withWatermark + dropDuplicates` — exactly-once keep-first
  *    per key within the lateness bound, state bounded by the
  *    watermark (safe at any scale).
  *  - T4: tumbling-window aggregates with watermark-driven state
  *    eviction — the streaming form of the A1 resample.
  *  - T1: snapshot refresh — foreachBatch upsert of "latest row per
  *    contract" into a snapshot table.
  *
  * All transforms are expressed on an unbound DataFrame so the SAME
  * code runs batch (tests, backfill) and streaming (live) — the
  * Spark-idiomatic replacement for the reference's poll loop.
  */
object StreamOps {

  /** T3 — late/duplicate handling: drop duplicate keys, tolerating
    * `lateness` out-of-order arrival. On a stream, state for a key is
    * dropped once the watermark passes; on a batch frame the watermark
    * is a no-op and this degrades to exact dedup.
    */
  def dedupWithWatermark(df: DataFrame, tsCol: String, lateness: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicates(keys :+ tsCol)

  /** T4 — streaming resample: tumbling window OHLC-style aggregate
    * with bounded state. Append-mode compatible (watermark closes
    * windows).
    */
  def windowedAgg(df: DataFrame, tsCol: String, lateness: String,
      interval: String, keys: Seq[String]): DataFrame = {
    val grouped = df
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), interval) +: keys.map(col): _*)
    grouped.agg(
      count(lit(1)).as("n_events"),
      max(col("value")).as("high"),
      min(col("value")).as("low"),
      sum(col("value").cast("decimal(30,4)")).cast("double").as("volume"))
      .withColumn("bucket", col("window.start"))
      .drop("window")
  }

  /** T1/T2 — snapshot semantics: latest row per key "as of now".
    * In foreachBatch this is the micro-batch refresh of the snapshot
    * table; same expression works on a batch frame.
    */
  def latestSnapshot(df: DataFrame, tsCol: String, keys: Seq[String],
      tieBreak: Seq[String]): DataFrame =
    graft.operators.CoreOps.dedupKeepLast(df, keys, (tsCol +: tieBreak))
}
