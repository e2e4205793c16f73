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

  /** T4 — streaming resample: tumbling (or, with `slide`, hopping)
    * window OHLC-style aggregate with bounded state. Append-mode
    * compatible (watermark closes windows); a sliding window holds
    * interval/slide open windows per key — still watermark-bounded.
    */
  def windowedAgg(df: DataFrame, tsCol: String, lateness: String,
      interval: String, keys: Seq[String],
      slide: Option[String] = None): DataFrame = {
    val win = slide match {
      case Some(sl) => window(col(tsCol), interval, sl)
      case None => window(col(tsCol), interval)
    }
    val grouped = df
      .withWatermark(tsCol, lateness)
      .groupBy(win +: keys.map(col): _*)
    grouped.agg(
      count(lit(1)).as("n_events"),
      max(col("value")).as("high"),
      min(col("value")).as("low"),
      sum(col("value").cast("decimal(30,4)")).cast("double").as("volume"))
      .withColumn("bucket", col("window.start"))
      .drop("window")
  }

  /** T3 variant — dedup by key ONLY (no ts in the key): duplicates of
    * a key arriving within the watermark delay of the kept row are
    * dropped even when their timestamps differ (retry storms, at-least
    * -once replays with re-stamped times). State per key expires once
    * the watermark passes the kept row's event time + delay — bounded,
    * unlike a bare `dropDuplicates(keys)` whose state grows forever on
    * a stream.
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, lateness: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** T6 — stream-stream interval join: each left event matched with
    * right events of the same key whose timestamp falls in
    * [leftTs, leftTs + maxDelay]. Both sides carry watermarks and the
    * range predicate is the state-eviction bound — an unbounded
    * stream-stream inner join would hold both sides' state forever;
    * with the bound, Spark drops left state once the right watermark
    * passes leftTs + maxDelay (and vice versa), so state is
    * O(rate × (lateness + maxDelay)) regardless of stream length. On
    * batch frames the watermarks are no-ops and this is a plain
    * interval join. Caller supplies disjoint column names (rename
    * before joining); `keys` are equality-compared across sides.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftTs: String, rightTs: String, lateness: String, maxDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    val keyCond = keys.map { case (lk, rk) => col(lk) === col(rk) }
      .reduce(_ && _)
    l.join(r, keyCond &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"))
  }

  /** T7 — stream-static ingestion gate: the STREAMING face of the
    * q124 batch-vs-corpus dedup. Incoming documents are fingerprinted
    * (md5 of the text), anti-joined against the PERSISTED corpus
    * fingerprint index — a STATIC frame, which Spark re-reads every
    * micro-batch, so an index refresh (yesterday's q124 output merged
    * in) is picked up without restarting the query — and deduplicated
    * within the stream by the watermark-bounded keep-first. Only
    * corpus-novel, stream-first documents pass. At scale the static
    * side is the bucketed signature table the batch pipeline
    * maintains; the anti join broadcasts or bucket-prunes exactly as
    * the batch plan does, per micro-batch.
    *
    * Batch-mode replay (the q48 pattern — q156 is the oracle-checked
    * batch face): `dropDuplicatesWithinWatermark` is streaming-only
    * by API, so a batch input takes plain `dropDuplicates` on the
    * same key. The two arms agree on the SURVIVOR SET only for
    * duplicates that arrive within the watermark window of each
    * other: the streaming arm expires its dedup state once the
    * watermark passes `lateness` beyond a hash's last sighting, so a
    * duplicate re-arriving LATER than that passes the stream gate
    * (state gone) but is dropped in batch replay (global hash set).
    * That divergence is intended — unbounded stream state is exactly
    * what `dropDuplicatesWithinWatermark` exists to avoid; callers
    * that need exactly-once across arbitrarily late re-arrivals must
    * refresh the STATIC corpus index with emitted hashes (the q124
    * merge cycle) rather than widen stream state. Consumers that need
    * batch determinism must key on `h`, as q156 does.
    *
    * `preHashed = true` skips the fingerprint step and trusts an
    * existing `h` column — for callers that need the hash for their
    * own downstream joins and would otherwise run the md5 kernel
    * over the full text twice (q156's enrichment).
    */
  def ingestionGate(stream: DataFrame, corpusHashes: DataFrame, tsCol: String,
      lateness: String, textCol: String = "text",
      preHashed: Boolean = false): DataFrame = {
    val hashed =
      if (preHashed) stream else stream.withColumn("h", md5(col(textCol)))
    val novel = hashed
      .join(corpusHashes.select(col("h")), Seq("h"), "left_anti")
    if (stream.isStreaming)
      novel.withWatermark(tsCol, lateness).dropDuplicatesWithinWatermark("h")
    else novel.dropDuplicates("h")
  }

  /** Streaming NEAR-dup ingestion gate — the LSH sibling of
    * [[ingestionGate]] (which only stops EXACT copies): a document
    * whose text was lightly edited sails through an md5 gate, so a
    * crawl ingester gates on MinHash band buckets instead. Input is
    * the document's EXPLODED band rows (doc_id, tsCol, band, bkey —
    * `nBands` rows per doc, all carrying the doc's one arrival
    * timestamp), matched against the static corpus band index the
    * batch dedup pipeline maintains (q24's signature table; refreshed
    * index picked up per micro-batch exactly as in ingestionGate).
    *
    * Gate rule: a doc passes iff ALL `nBands` of its buckets are
    * corpus-novel. Any shared bucket means a possible near-dup and
    * conservatively rejects — the RECALL-oriented production gate;
    * precision (exact-Jaccard verification of the rejects) belongs
    * downstream in the batch pipeline (q124's incremental shape),
    * where the text of both sides is at hand. Docs with no shingles
    * (too short for the gram size) have NULL bkeys, which never
    * match an equi-join key: they pass, by design — LSH cannot see
    * an empty shingle set (same contract as q102's exact-edge
    * routing).
    *
    * Streaming legality at scale: the anti-join is stream-static
    * (stateless, bucket-prunable); the all-bands check is one
    * aggregation grouped on (window(tsCol), doc_id) — every band row
    * of a doc shares its single arrival timestamp, so the window adds
    * NO semantic grouping, only the event-time key that lets
    * append-mode emit and the watermark EVICT per-doc state (a bare
    * groupBy(doc_id) would grow state with every doc ever seen).
    * Batch face: identical expressions (window() groups in batch
    * too), the oracle-checked q159.
    */
  def nearDupGate(bandRows: DataFrame, corpusIndex: DataFrame,
      tsCol: String, lateness: String, nBands: Int): DataFrame = {
    val wm =
      if (bandRows.isStreaming) bandRows.withWatermark(tsCol, lateness)
      else bandRows
    wm.join(corpusIndex.select(col("band"), col("bkey")),
        Seq("band", "bkey"), "left_anti")
      .groupBy(window(col(tsCol), lateness), col("doc_id"))
      .agg(count(lit(1)).as("novel_bands"))
      .filter(col("novel_bands") === nBands)
      .select(col("doc_id"))
  }

  /** T1/T2 — snapshot semantics: latest row per key "as of now".
    * In foreachBatch this is the micro-batch refresh of the snapshot
    * table; same expression works on a batch frame.
    */
  def latestSnapshot(df: DataFrame, tsCol: String, keys: Seq[String],
      tieBreak: Seq[String]): DataFrame =
    graft.operators.CoreOps.dedupKeepLast(df, keys, (tsCol +: tieBreak))
}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — per-key mutable state + event-time
  * timeout, the extension point for stream semantics no built-in
  * window covers (beyond reference parity; the reference has no
  * streaming state at all, SURVEY §2.10).
  *
  * State per key is ONE open session (constant size); sessions emit
  * when a gap closes them or the event-time watermark times the key
  * out — so state is bounded and the operator runs at any key
  * cardinality.
  */
object StatefulSessions {

  import org.apache.spark.sql.Dataset
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  final case class Event(userId: Long, ts: java.sql.Timestamp, value: Double)

  final case class OpenSession(start: Long, end: Long, n: Long, sum: Double)

  final case class Session(userId: Long, sessionStart: java.sql.Timestamp,
      sessionEnd: java.sql.Timestamp, nEvents: Long, totalValue: Double)

  val gapMicros: Long = 30L * 60 * 1000000

  private def toSession(userId: Long, s: OpenSession): Session =
    Session(userId, new java.sql.Timestamp(s.start / 1000),
      new java.sql.Timestamp(s.end / 1000), s.n, s.sum)

  def processGroup(userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(userId, _))
      state.remove()
      return out.iterator
    }
    // micro-batch arrivals processed in event order
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.value))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime * 1000
      open match {
        case Some(s) if t - s.end <= gapMicros =>
          open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.sum + e.value))
        case Some(s) =>
          closed += toSession(userId, s)
          open = Some(OpenSession(t, t, 1, e.value))
        case None =>
          open = Some(OpenSession(t, t, 1, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.end / 1000 + 30 * 60 * 1000)
    }
    closed.result().iterator
  }

  /** Wire the stateful operator over a (possibly unbound) event set. */
  def sessionize(ds: Dataset[Event]): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "1 hour")
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(processGroup)
  }
}
