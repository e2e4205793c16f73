package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Corpus-curation operators for large-scale training-data pipelines:
  * span-level substring deduplication, overlapping document chunking,
  * and grouped least-squares regression. These extend the engine past
  * the reference's own surface (the reference has no corpus tooling;
  * cf. its per-table dedup at dbase/db_manager.py:385-401) toward the
  * operations a 100 TB text pipeline runs daily.
  *
  * Scale notes are per-operator; every shape here is a constant number
  * of hash shuffles over linearly-bounded intermediates — nothing
  * collects to the driver and nothing is quadratic in documents or in
  * a hot key.
  */
object CurationOps {

  /** Span-level duplicated-text measurement (the "exact substring
    * dedup" signal of Lee et al. 2022, *Deduplicating Training Data
    * Makes Language Models Better*, arXiv:2107.06499) re-expressed for
    * Spark: instead of a suffix array over the concatenated corpus
    * (inherently sequential), duplicated regions are detected through
    * word `k`-grams — content-defined anchors, so two copies of a
    * passage align regardless of their positions in their documents —
    * and per-document duplicated-WORD coverage is the union of the
    * `[i, i+k-1]` spans of every k-gram that occurs in ≥2 documents.
    * Any duplicated passage of ≥ k words is found exactly; shorter
    * overlaps are ignored by construction (they are the k-gram
    * equivalent of suffix-array minimum match length).
    *
    * Plan: one explode to (doc, pos, gram) — ~n_words rows per doc —
    * one hash-agg on gram for document frequency, one equi-join back,
    * one k-bounded explode for coverage, one distinct+count per doc.
    * All shuffles key on gram or doc_id; intermediates are linear in
    * corpus words (the coverage explode is k× the *matched* grams
    * only). At 100 TB the gram string key would be replaced by
    * `xxhash64(gram)` to shrink shuffle width ~8× (collision odds
    * ~n²/2⁶⁴); kept as the string here so the DuckDB oracle replays
    * the operator exactly.
    *
    * Output: (doc_id, n_words, dup_words, dup_fraction) per document,
    * dup_fraction = duplicated-word share in [0, 1].
    */
  def duplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"duplicatedSpans k must be >= 2, got $k")
    val base = docs.select(
      col(idCol).as("doc_id"),
      split(col(textCol), " ").as("__w"))
      .withColumn("__n", size(col("__w")))
    // Spark's sequence(1, hi) DESCENDS when hi < 1 (step defaults to
    // -1), so short documents must yield an explicitly empty position
    // list, not sequence(1, 0) = [1, 0].
    val positions = when(col("__n") >= k, sequence(lit(1), col("__n") - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val grams = base.select(
      col("doc_id"),
      explode(transform(positions, i =>
        struct(i.as("pos"), array_join(slice(col("__w"), i, lit(k)), " ").as("gram"))))
        .as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
    val dupGrams = grams.select("doc_id", "gram").distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("gram")
    val covered = grams.join(dupGrams, "gram")
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("dup_words"))
    base.select(col("doc_id"), col("__n").cast("long").as("n_words"))
      .join(covered, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_words"))
      .withColumn("dup_fraction",
        col("dup_words").cast(DoubleType) / col("n_words").cast(DoubleType))
  }

  /** Overlapping fixed-size word chunking — the retrieval-corpus /
    * context-window preprocessing step: each document becomes
    * `1 + ceil(max(n - chunkWords, 0) / stride)` chunks of up to
    * `chunkWords` words starting every `stride` words, so consecutive
    * chunks overlap by `chunkWords - stride` words and the final chunk
    * is never empty. Purely map-side (explode of a per-row computed
    * sequence): no shuffle, embarrassingly parallel at any corpus
    * size, and the chunk count per row is bounded by n/stride so the
    * row amplification is a fixed ~`chunkWords/stride`×.
    *
    * Output: (doc_id, chunk_id, start_word, chunk_words, chunk_text).
    */
  def chunkDocuments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkWords: Int = 32,
      stride: Int = 24): DataFrame = {
    require(chunkWords >= 1 && stride >= 1 && stride <= chunkWords,
      s"chunkDocuments needs 1 <= stride <= chunkWords, got $stride/$chunkWords")
    // A null document has no chunks (greatest(NULL - C, 0) would
    // otherwise resolve to 0 — Spark's greatest skips nulls — and
    // fabricate one null chunk).
    val base = docs.select(
      col(idCol).as("doc_id"),
      split(col(textCol), " ").as("__w"))
      .where(col("__w").isNotNull)
      .withColumn("__n", size(col("__w")))
    val nChunks = (floor(
      (greatest(col("__n") - chunkWords, lit(0)) + lit(stride - 1)) /
        lit(stride.toDouble)).cast("int") + 1)
    val start = lit(1) + col("chunk_id") * stride
    base
      .withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("chunk_id", col("chunk_id").cast("long"))
      .withColumn("start_word", start.cast("long"))
      .withColumn("chunk_words",
        size(slice(col("__w"), start.cast("int"), lit(chunkWords))).cast("long"))
      .withColumn("chunk_text",
        array_join(slice(col("__w"), start.cast("int"), lit(chunkWords)), " "))
      .select("doc_id", "chunk_id", "start_word", "chunk_words", "chunk_text")
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003,
    * *Winnowing: Local Algorithms for Document Fingerprinting*, SIGMOD
    * — the MOSS algorithm): hash every word `k`-gram, then in each
    * sliding window of `w` consecutive gram hashes keep the minimum
    * (rightmost on hash ties, the paper's robust winnowing). The
    * selected (position, hash) pairs are the document's fingerprint
    * sketch: ~`2/(w+1)` of the grams, with the GUARANTEE that any two
    * documents sharing a passage of ≥ `w + k - 1` words share at
    * least one fingerprint — a bounded-size sketch with a recall
    * floor, unlike MinHash's probabilistic one.
    *
    * The gram hash is the first 16 hex chars of md5 compared
    * lexicographically — computable bit-identically by any engine, so
    * the whole selection is oracle-replayable (no engine-private hash
    * in the algorithm's decision path). Tail windows shorter than `w`
    * are included (they only ever ADD fingerprints, preserving the
    * guarantee).
    *
    * Plan: one map-side gram explode, ONE shuffle (window partition by
    * doc), per-doc frames bounded by document length. Returns the
    * fingerprint rows (doc_id, pos, fp); dedup/aggregate downstream
    * stays partitioned on doc_id so a per-doc rollup adds no exchange.
    */
  def winnowFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowFingerprints needs k,w >= 1, got $k/$w")
    val base = docs.select(
      col(idCol).as("doc_id"),
      split(col(textCol), " ").as("__w"))
      .withColumn("__n", size(col("__w")))
    val positions = when(col("__n") >= k, sequence(lit(1), col("__n") - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val grams = base.select(
      col("doc_id"),
      explode(transform(positions, i => struct(
        i.as("pos"),
        substring(md5(array_join(slice(col("__w"), i, lit(k)), " ")), 1, 16)
          .as("h")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(0, w - 1)
    // min over (hash asc, -pos asc) = smallest hash, rightmost tie
    grams
      .withColumn("mk", min(struct(col("h"), (-col("pos")).as("np"))).over(win))
      .select(col("doc_id"), (-col("mk.np")).as("pos"), col("mk.h").as("fp"))
      .distinct()
  }

  /** Grouped simple least-squares fit of `y = slope·x + intercept`
    * with coefficient of determination r² — per-group corpus/market
    * trend analytics in ONE partial-aggregable shuffle.
    *
    * The five moment sums (Σx, Σy, Σxy, Σx², Σy²) are taken over
    * exact fixed-scale decimals (the [[CoreOps.dsum]] technique: each
    * factor is cast to DECIMAL(precision, scale) BEFORE multiplying,
    * so every product and sum is exact integer arithmetic — identical
    * on any partitioning, any cluster size, and any engine). Only the
    * final slope/intercept/r² divisions run in double, on inputs that
    * are already bit-identical everywhere. A group with zero
    * x-variance (or zero y-variance for r²) yields NULL, mirroring
    * SQL's `regr_slope`/`regr_r2` — and keeping the plan ANSI-safe.
    *
    * `precision`/`scale` must cover the inputs ((12,2) default — keep
    * precision ≤ 14 so the x·y product precision 2·p+1 stays within
    * DECIMAL(38) headroom on every engine; values that don't fit the
    * cast become NULL and drop from the fit like SQL aggregate nulls).
    */
  def groupRegression(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String,
      precision: Int = 12,
      scale: Int = 2): DataFrame = {
    require(precision <= 14, s"groupRegression precision must be <= 14, got $precision")
    def dec(c: Column): Column = c.cast(DecimalType(precision, scale))
    val x = col(xCol)
    val y = col(yCol)
    val m = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).cast(DoubleType).as("__n"),
      sum(dec(x)).cast(DoubleType).as("__sx"),
      sum(dec(y)).cast(DoubleType).as("__sy"),
      sum(dec(x) * dec(y)).cast(DoubleType).as("__sxy"),
      sum(dec(x) * dec(x)).cast(DoubleType).as("__sxx"),
      sum(dec(y) * dec(y)).cast(DoubleType).as("__syy"))
    val n = col("__n")
    val cov = n * col("__sxy") - col("__sx") * col("__sy")
    val varX = n * col("__sxx") - col("__sx") * col("__sx")
    val varY = n * col("__syy") - col("__sy") * col("__sy")
    // Outputs are rounded to 8 decimals: a moment sum whose scaled
    // magnitude exceeds 2^53 (Σy² easily does) converts decimal→double
    // with engine-specific final-ulp rounding, and the quotient
    // inherits that ulp. Eight decimals is far beyond any statistical
    // meaning of a fit coefficient and makes the result engine- and
    // partitioning-stable.
    val slope = when(varX =!= 0.0, cov / varX)
    m.withColumn("slope", round(slope, 8))
      .withColumn("intercept",
        round((col("__sy") - slope * col("__sx")) / n, 8))
      .withColumn("r2",
        round(when(varX * varY =!= 0.0, (cov * cov) / (varX * varY)), 8))
      .withColumn("n", n.cast("long"))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx", "__syy")
  }
}
