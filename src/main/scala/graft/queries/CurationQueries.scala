package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{CurationOps, Staging}
import graft.plans.NativeFunctions

/** Corpus-curation query family: span-level substring dedup, RAG-style
  * overlapping chunking, grouped OLS regression, and the byte-entropy
  * quality signal — the curation operations of a training-data
  * pipeline beyond the pair/cluster dedup families (q23-q26, q82-q85).
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q107 — per-document duplicated-span fraction via word 8-grams
    * (Lee et al. 2022 exact-substring signal; CurationOps scale notes).
    */
  def substringDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(s, dir, "documents")
    CurationOps.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id")
  }

  val substringDedupSql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |grams AS (
      |  SELECT doc_id, i AS pos, array_to_string(w[i:i+7], ' ') AS gram
      |  FROM words, LATERAL UNNEST(generate_series(1, len(w) - 7)) AS t(i)
      |  WHERE len(w) >= 8),
      |dup AS (
      |  SELECT gram FROM (
      |    SELECT gram, count(DISTINCT doc_id) AS df FROM grams GROUP BY gram)
      |  WHERE df >= 2),
      |cov AS (
      |  SELECT DISTINCT g.doc_id, u.p
      |  FROM grams g JOIN dup d USING (gram),
      |       LATERAL UNNEST(generate_series(g.pos, g.pos + 7)) AS u(p))
      |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_words,
      |  coalesce(c.dup_words, 0) AS dup_words,
      |  CAST(coalesce(c.dup_words, 0) AS DOUBLE)
      |    / CAST(len(w.w) AS DOUBLE) AS dup_fraction
      |FROM words w
      |LEFT JOIN (SELECT doc_id, count(*) AS dup_words FROM cov GROUP BY doc_id) c
      |  USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q173 — exact duplicated-substring REMOVAL with first-occurrence
    * retention ([[CurationOps.exactSubstringRemove]] — the full Lee
    * et al. 2022 ExactSubstr tier; q107 is its measurement half).
    * The oracle replays the whole pipeline: gram occurrence counts
    * INCLUDING within-doc repeats, the lexicographic (doc_id, pos)
    * argmin as the surviving copy, merged maximal spans, and the
    * cleaned text's md5 — so the differential is sensitive to every
    * kept/cut word boundary in the corpus.
    */
  def exactSubstringRemove(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(s, dir, "documents")
    CurationOps.exactSubstringRemove(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id")
  }

  val exactSubstringRemoveSql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents),
      |grams AS MATERIALIZED (
      |  SELECT doc_id, i AS pos, array_to_string(w[i:i+7], ' ') AS gram
      |  FROM words, LATERAL UNNEST(generate_series(1, len(w) - 7)) AS t(i)
      |  WHERE len(w) >= 8),
      |gs AS MATERIALIZED (
      |  SELECT gram, struct_extract(fo, 'd') AS fd, struct_extract(fo, 'p') AS fp
      |  FROM (
      |    SELECT gram, count(*) AS occ,
      |      min(struct_pack(d := doc_id, p := pos)) AS fo
      |    FROM grams GROUP BY gram)
      |  WHERE occ >= 2),
      |rem AS (
      |  SELECT g.doc_id, g.pos
      |  FROM grams g JOIN gs USING (gram)
      |  WHERE NOT (g.doc_id = gs.fd AND g.pos = gs.fp)),
      |cov AS MATERIALIZED (
      |  SELECT DISTINCT r.doc_id, u.p
      |  FROM rem r, LATERAL UNNEST(generate_series(r.pos, r.pos + 7)) AS u(p)),
      |covlist AS (
      |  SELECT doc_id, list_sort(list(p)) AS cov FROM cov GROUP BY doc_id)
      |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_words,
      |  CAST(coalesce(len(c.cov), 0) AS BIGINT) AS removed_words,
      |  CAST(coalesce(len(list_filter(
      |    list_transform(range(1, len(c.cov) + 1), i ->
      |      CASE WHEN i = 1 THEN 1
      |           WHEN c.cov[CAST(i AS INT)] > c.cov[CAST(i AS INT) - 1] + 1 THEN 1
      |           ELSE 0 END),
      |    x -> x = 1)), 0) AS BIGINT) AS n_spans,
      |  -- duckdb 1.0 array_to_string([]) is NULL, not '' — a fully
      |  -- removed document must still hash the empty string
      |  md5(coalesce(array_to_string(
      |    list_filter(w.w, (x, i) -> NOT list_contains(coalesce(c.cov, []), i)),
      |    ' '), '')) AS clean_sig
      |FROM words w LEFT JOIN covlist c USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q108 — overlapping 32-word chunks every 24 words (8-word overlap):
    * the retrieval/context-window corpus preparation step. Map-side
    * only — no shuffle in the plan beyond the output sort.
    */
  def chunkDocuments(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    CurationOps.chunkDocuments(docs, "doc_id", "text", chunkWords = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")
  }

  val chunkDocumentsSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |n AS (
      |  SELECT doc_id, w,
      |    CAST(FLOOR((greatest(len(w) - 32, 0) + 23) / 24.0) AS INT) + 1 AS nc
      |  FROM t)
      |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
      |  CAST(1 + ci * 24 AS BIGINT) AS start_word,
      |  CAST(len(w[1 + ci * 24 : ci * 24 + 32]) AS BIGINT) AS chunk_words,
      |  array_to_string(w[1 + ci * 24 : ci * 24 + 32], ' ') AS chunk_text
      |FROM n, LATERAL UNNEST(generate_series(0, nc - 1)) AS u(ci)
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** q109 — per-nation OLS fit of extendedprice on quantity over
    * lineitem⨝supplier (ONE partial-aggregable shuffle for the five
    * exact decimal moment sums; the divisions run in double on
    * bit-identical inputs — see CurationOps). The supplier join
    * carries NO broadcast hint: supplier grows with the scale factor,
    * so the choice belongs to Catalyst's size stats / AQE (which
    * broadcast it at every test SF); only the 25-row nation dim is
    * hinted.
    */
  def groupRegression(s: SparkSession, dir: String): DataFrame = {
    // loadSpreadLocal: the five exact-decimal moment products ride
    // the scan as the partial aggregate; on the toy single-row-group
    // layout that serializes them onto one core (profiled: 2.2 s of
    // the query's 3.3 s). Identity on a cluster deploy.
    val li = Tables.loadSpreadLocal(s, dir, "lineitem")
    val sup = Tables.load(s, dir, "supplier")
    val nat = Tables.load(s, dir, "nation")
    val joined = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
    CurationOps.groupRegression(
      joined, Seq("s_nationkey"), "l_quantity", "l_extendedprice")
      .join(broadcast(nat), col("s_nationkey") === nat("n_nationkey"))
      .select(col("n_name").as("nation"), col("n"),
        col("slope"), col("intercept"), col("r2"))
      .orderBy("nation")
  }

  val groupRegressionSql: String =
    """WITH j AS (
      |  SELECT s.s_nationkey,
      |    CAST(l.l_quantity AS DECIMAL(12,2)) AS x,
      |    CAST(l.l_extendedprice AS DECIMAL(12,2)) AS y
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |m AS (
      |  -- pairwise-complete only: the count and every moment sum see
      |  -- the same rows (mirrors the engine's pw() rule; on the
      |  -- null-free fixture this is identical to COUNT(*))
      |  SELECT s_nationkey,
      |    CAST(COUNT(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS DOUBLE) AS n,
      |    CAST(SUM(CASE WHEN y IS NOT NULL THEN x END) AS DOUBLE) AS sx,
      |    CAST(SUM(CASE WHEN x IS NOT NULL THEN y END) AS DOUBLE) AS sy,
      |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
      |    CAST(SUM(CASE WHEN y IS NOT NULL THEN x * x END) AS DOUBLE) AS sxx,
      |    CAST(SUM(CASE WHEN x IS NOT NULL THEN y * y END) AS DOUBLE) AS syy
      |  FROM j GROUP BY s_nationkey),
      |f AS (
      |  SELECT s_nationkey, n, sx, sy,
      |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      |    ((n * sxy - sx * sy) * (n * sxy - sx * sy))
      |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      |  FROM m)
      |SELECT nt.n_name AS nation, CAST(f.n AS BIGINT) AS n,
      |  round(f.slope, 8) AS slope,
      |  -- 6 decimals, not 8: intercept carries the y magnitude, where
      |  -- an 8-decimal boundary sits within one double ulp (engine
      |  -- divergence observed at sf0.1); mirrors the engine
      |  round((f.sy - f.slope * f.sx) / f.n, 6) AS intercept,
      |  round(f.r2, 8) AS r2
      |FROM f JOIN nation nt ON f.s_nationkey = nt.n_nationkey
      |ORDER BY nation""".stripMargin

  /** q167 — trained-classifier quality inference
    * ([[CurationOps.hashedBagScore]]): the fastText-class linear
    * scorer a real pipeline applies AFTER the heuristics tier
    * (q21/q106/q110) — hashing-trick bag of tokens against a literal
    * trained weight vector, mean-pooled, plus bias, thresholded. The
    * 64-dim weight table is deterministic here (a stand-in for the
    * trained artifact; dimension a power of two so the signed/unsigned
    * FNV bucket congruence holds — see hashedBagScore). One stateless
    * codegen scan: no join, no broadcast, no UDF, no exchange before
    * the presentation sort (CurationSpec pins it).
    */
  private[graft] val QualityDim = 64
  private[graft] val QualityBias = 0.05
  private[graft] val QualityWeights: Seq[Double] =
    (0 until QualityDim).map(i => ((i * 37 + 11) % 21 - 10) / 10.0)

  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpreadLocal(s, dir, "documents")
    docs
      .select(col("doc_id"),
        CurationOps.hashedBagScore(col("text"), QualityWeights, QualityBias)
          .as("score"))
      .withColumn("kept", col("score") >= QualityBias)
      .orderBy("doc_id")
  }

  /** The oracle replays the scorer term by term IN TOKEN ORDER (the
    * engine's [[graft.plans.HashedBagScore]] sums in a sequential
    * left fold over the word array, so `list_reduce` over the same
    * list reproduces bit-identical doubles — no rounding crutch
    * needed): same FNV-1a mirror as q26 (UTF-8-byte expansion, so the
    * hashes agree beyond ASCII), same power-of-two bucket (h mod 64
    * is congruent between the oracle's unsigned HUGEINT hash and the
    * engine's signed Long because 64 divides 2^64), same literal
    * weights.
    */
  val qualityClassifierSql: String = {
    val wlit = QualityWeights.mkString("[", ", ", "]")
    s"""WITH wv AS (SELECT $wlit::DOUBLE[] AS w),
       |t AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
       |    x -> x <> '') AS toks
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id,
       |    $QualityBias::DOUBLE + CASE WHEN len(toks) = 0 THEN 0.0::DOUBLE
       |      ELSE list_reduce(list_prepend(0.0::DOUBLE, list_transform(toks,
       |        tok -> w[CAST(${TextQueries.fnv1aSqlExpr("tok")} % $QualityDim AS INT) + 1])),
       |        (a, b) -> a + b) / len(toks) END AS score
       |  FROM t, wv)
       |SELECT doc_id, score, score >= $QualityBias::DOUBLE AS kept
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** q110 — byte-entropy quality signal (native codegen
    * [[graft.plans.ByteEntropy]]; the corpus is ASCII so byte entropy
    * equals the oracle's character entropy). Rounded to 6 decimals on
    * BOTH sides before the threshold flag: the entropy sum is the one
    * value here whose floating summation order differs between
    * engines, and rounding absorbs the final-ulp drift.
    */
  def charEntropy(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    docs.select(
      col("doc_id"), col("n_chars"),
      round(NativeFunctions.byteEntropy(col("text")), 6).as("char_entropy"))
      .withColumn("low_entropy", col("char_entropy") < 3.5)
      .orderBy("doc_id")
  }

  val charEntropySql: String =
    """WITH c AS (
      |  SELECT doc_id, substr(text, i, 1) AS ch
      |  FROM documents, LATERAL UNNEST(generate_series(1, length(text))) AS t(i)),
      |e AS (
      |  SELECT doc_id, round(entropy(ch), 6) AS char_entropy
      |  FROM c GROUP BY doc_id)
      |SELECT d.doc_id, d.n_chars, e.char_entropy,
      |  e.char_entropy < 3.5 AS low_entropy
      |FROM documents d JOIN e USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** q111 — winnowing fingerprint sketch (Schleimer et al. 2003) per
    * document: k=4 word grams, window w=4, md5-prefix hashes → the
    * selected-fingerprint count and density (expected ≈ 2/(w+1) of
    * grams, guaranteed to catch any shared passage of ≥ 7 words).
    */
  def winnowFingerprints(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(s, dir, "documents")
    val fps = CurationOps.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_words"))
      .join(fps, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_fp"))
      .withColumn("n_grams", greatest(col("n_words") - 3, lit(0L)))
      .withColumn("fp_density",
        when(col("n_grams") > 0,
          col("n_fp").cast("double") / col("n_grams").cast("double")))
      .orderBy("doc_id")
  }

  val winnowFingerprintsSql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |grams AS (
      |  SELECT doc_id, i AS pos,
      |    substr(md5(array_to_string(w[i:i+3], ' ')), 1, 16) AS h
      |  FROM words, LATERAL UNNEST(generate_series(1, len(w) - 3)) AS t(i)
      |  WHERE len(w) >= 4),
      |sel AS (
      |  SELECT doc_id,
      |    MIN(struct_pack(h := h, np := -pos))
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk
      |  FROM grams),
      |fp AS (
      |  SELECT doc_id, count(DISTINCT mk) AS n_fp
      |  FROM sel GROUP BY doc_id)
      |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_words,
      |  coalesce(f.n_fp, 0) AS n_fp,
      |  greatest(CAST(len(w.w) AS BIGINT) - 3, 0) AS n_grams,
      |  CASE WHEN len(w.w) > 3 THEN
      |    CAST(coalesce(f.n_fp, 0) AS DOUBLE)
      |      / CAST(len(w.w) - 3 AS DOUBLE) END AS fp_density
      |FROM words w LEFT JOIN fp f USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q112 — per-source percentile quality filter: "drop each source's
    * lowest-entropy 20%". Two-pass global-threshold shape: one grouped
    * `percentile_disc` aggregate (per-source thresholds — bounded by
    * source cardinality, safely broadcast), one broadcast join back,
    * one stateless comparison. The standard curation idiom for
    * "keep the top X% by quality" at corpus scale — no global sort,
    * no window over the corpus.
    */
  def qualityPercentileFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .withColumn("score",
        round(NativeFunctions.byteEntropy(col("text")), 6))
    val th = docs.groupBy(col("source"))
      .agg(expr("percentile_disc(0.2) WITHIN GROUP (ORDER BY score)").as("threshold"))
    docs.join(broadcast(th), "source")
      .withColumn("kept", col("score") >= col("threshold"))
      .select("doc_id", "source", "score", "threshold", "kept")
      .orderBy("doc_id")
  }

  val qualityPercentileFilterSql: String =
    """WITH c AS (
      |  SELECT doc_id, substr(text, i, 1) AS ch
      |  FROM documents, LATERAL UNNEST(generate_series(1, length(text))) AS t(i)),
      |e AS (
      |  SELECT doc_id, round(entropy(ch), 6) AS score FROM c GROUP BY doc_id),
      |d AS (
      |  SELECT doc_id, source, score FROM documents JOIN e USING (doc_id)),
      |th AS (
      |  SELECT source,
      |    PERCENTILE_DISC(0.2) WITHIN GROUP (ORDER BY score) AS threshold
      |  FROM d GROUP BY source)
      |SELECT doc_id, source, score, threshold, score >= threshold AS kept
      |FROM d JOIN th USING (source)
      |ORDER BY doc_id""".stripMargin

  /** q113 — near-duplicate pairs from the winnowing sketch: candidate
    * generation joins the ~2/(w+1)-density fingerprint sets (with a
    * df ≤ 50 boilerplate cap, the q25 hot-key discipline) instead of
    * the full shingle inverted index, then the exact 4-gram Jaccard
    * verifies each candidate — same candidates→verify shape as
    * q24/q25, but the candidate stage carries winnowing's recall
    * GUARANTEE (any ≥7-word shared passage yields a shared
    * fingerprint) at ~0.4× the index size. All joins are equi-joins
    * keyed on fingerprint / gram / pair; the verify is restricted to
    * candidate pairs, never all-pairs.
    *
    * Staging (the q24 discipline, caller-owned lifecycle): the
    * fingerprint sketch feeds the hot-set aggregate AND the capped
    * sketch's fill — persisted instead of re-running the md5 +
    * per-doc-window winnow pipeline per consumer (measured −29% wall
    * at sf0.1 AND −23% at the 10× probe); the capped sketch `fpk` is
    * persisted too so its anti-join runs once, not once per side of
    * the candidate self-join. The gram index is left UNpersisted on
    * purpose: its three consumers share one canonical distinct
    * exchange that Spark's ReuseExchange already deduplicates, and an
    * A/B showed both a gram persist and a candidate-id semi-join
    * restriction REGRESS the toy scale (+29%) for no probe win over
    * this shape.
    */
  def winnowNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(s, dir, "documents")
    // the boilerplate cap is an aggregate (map-side partial) + an
    // anti-join against the SMALL hot-fingerprint set — deliberately
    // not a window count carried on the rows (tried and reverted —
    // see TextQueries.coolBanded: a window funnels a hot
    // fingerprint's whole row set through one un-splittable
    // WindowExec task, while the anti-join is AQE-broadcastable and
    // skew-splittable). `fpk` is persisted so the anti-join runs
    // once, not once per side of the candidate self-join; `fp` stays
    // persisted because the winnow pipeline (md5 + per-doc windows)
    // feeds both the hot aggregate and fpk's fill.
    val fp = Staging.staged(
      CurationOps.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4)
        .select("doc_id", "fp").distinct())
    val hot = fp.groupBy("fp").agg(count(lit(1)).as("dfp"))
      .filter(col("dfp") > 50).select("fp")
    val fpk = Staging.staged(fp.join(hot, Seq("fp"), "left_anti"))
    val cand = fpk.select(col("fp"), col("doc_id").as("i"))
      .join(fpk.select(col("fp"), col("doc_id").as("j")), "fp")
      .where(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n_shared_fp"))
      .filter(col("n_shared_fp") >= 3)
    // distinct 4-grams via the native Shingles kernel (one fused
    // codegen pass; the transform(array_join(slice)) HOF it replaces
    // was interpreted per row — rule §4). Per-doc kernel distinct ≡
    // the row distinct (doc_id is unique per input row); the explicit
    // .distinct() is kept so the THREE gs consumers keep sharing one
    // canonical exchange (ReuseExchange — the layout A/B'd in r17).
    val gs = docs.select(
      col("doc_id"),
      explode(graft.functions.TextOps.shingles(
        split(col("text"), " "), 4)).as("gram"))
      .distinct()
    val gcnt = gs.groupBy("doc_id").agg(count(lit(1)).as("ng"))
    // shuffle_hash on the two gs verify joins: gs is CORPUS-LINEAR
    // (every doc's distinct grams), and the planner's size estimate
    // for it flows through Generate(explode)+distinct, which
    // undersizes badly — at the 10x probe it statically planned gs
    // (~10M (doc_id, gram) rows) as a BROADCAST build side. local[n]
    // masks the bomb (a local broadcast shares the driver's object:
    // no per-executor deserialization, no memory bill) but under real
    // executors (GRAFT_MASTER=local-cluster, 4x7 GB)
    // UnsafeHashedRelation.read OOM'd every executor — the r18
    // multiexec probe's one failure. The hint pins what the
    // bounded-broadcast rule already says: a frame that grows with
    // the corpus never enters as a broadcast build, at ANY estimate;
    // the candidate-bounded left side is the per-partition hash build
    // instead. gcnt (one slim row per doc, ~1 MB at the probe) stays
    // un-hinted: its real size self-selects broadcast at bench scales
    // and a shuffle at warehouse scales.
    val inter = cand.hint("shuffle_hash")
      .join(gs.select(col("doc_id").as("i"), col("gram")), "i")
      .hint("shuffle_hash")
      .join(gs.select(col("doc_id").as("j"), col("gram")), Seq("j", "gram"))
      .groupBy("i", "j", "n_shared_fp").agg(count(lit(1)).as("inter"))
    inter
      .join(gcnt.select(col("doc_id").as("i"), col("ng").as("ni")), "i")
      .join(gcnt.select(col("doc_id").as("j"), col("ng").as("nj")), "j")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("ni") + col("nj") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select("i", "j", "n_shared_fp", "jaccard")
      .orderBy("i", "j")
  }

  val winnowNearDupSql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |grams AS (
      |  SELECT doc_id, i AS pos, array_to_string(w[i:i+3], ' ') AS gram,
      |    substr(md5(array_to_string(w[i:i+3], ' ')), 1, 16) AS h
      |  FROM words, LATERAL UNNEST(generate_series(1, len(w) - 3)) AS t(i)
      |  WHERE len(w) >= 4),
      |sel AS (
      |  SELECT doc_id,
      |    MIN(struct_pack(h := h, np := -pos))
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk
      |  FROM grams),
      |fp AS (SELECT DISTINCT doc_id, struct_extract(mk, 'h') AS fp FROM sel),
      |rare AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 50),
      |fpk AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp)),
      |cand AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS n_shared_fp
      |  FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3),
      |gs AS (SELECT DISTINCT doc_id, gram FROM grams),
      |gcnt AS (SELECT doc_id, count(*) AS ng FROM gs GROUP BY doc_id),
      |iv AS (
      |  SELECT c.i, c.j, c.n_shared_fp, count(*) AS inter
      |  FROM cand c
      |  JOIN gs x ON x.doc_id = c.i
      |  JOIN gs y ON y.doc_id = c.j AND y.gram = x.gram
      |  GROUP BY c.i, c.j, c.n_shared_fp)
      |SELECT iv.i, iv.j, iv.n_shared_fp,
      |  CAST(iv.inter AS DOUBLE)
      |    / CAST(gi.ng + gj.ng - iv.inter AS DOUBLE) AS jaccard
      |FROM iv
      |JOIN gcnt gi ON gi.doc_id = iv.i
      |JOIN gcnt gj ON gj.doc_id = iv.j
      |WHERE CAST(iv.inter AS DOUBLE)
      |    / CAST(gi.ng + gj.ng - iv.inter AS DOUBLE) >= 0.5
      |ORDER BY iv.i, iv.j""".stripMargin

  /** q114 — DSIR importance resampling (Xie et al. 2023,
    * arXiv:2302.03169): treat src0/src1 as the high-quality TARGET
    * domain and every other source as the RAW crawl; score each raw
    * document with [[CurationOps.dsirLogWeights]] (hashed uni+bigram
    * bucket log-likelihood ratios, add-one smoothing) and draw the
    * 100-document selection by Gumbel top-k — `log w + g` where the
    * Gumbel noise `g = -ln(-ln(u))` comes from a seeded md5 uniform,
    * so the "sample without replacement ∝ w" draw is deterministic
    * and engine-replayable. The final ORDER BY/LIMIT plans as a
    * bounded top-k (TakeOrderedAndProject / TopKRewrite class), never
    * a global sort.
    *
    * Both engines compute identical ln arguments (exact integers
    * through correctly-rounded double ops); the 6-decimal rounding on
    * the summed weight absorbs summation-order ulps (q110 precedent).
    */
  def dsirResample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val weights = CurationOps.dsirLogWeights(
      docs, "doc_id", "text", col("source").isin("src0", "src1"))
    val hex6 = substring(
      md5(concat(lit("dsir:"), col("doc_id").cast("string"))), 1, 6)
    val u = (conv(hex6, 16, 10).cast("long") + lit(1L)).cast("double") /
      lit(16777217.0)
    val gumbel = -log(-log(u))
    weights
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .withColumn("sel_key", round(col("log_w_raw") + gumbel, 6))
      .select(col("doc_id"), col("source"), col("n_grams"),
        round(col("log_w_raw"), 6).as("log_w"), col("sel_key"))
      .orderBy(col("sel_key").desc, col("doc_id"))
      .limit(100)
  }

  val dsirResampleSql: String =
    """WITH w AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |g AS (
      |  SELECT doc_id, source IN ('src0', 'src1') AS is_t,
      |    substr(md5(gram), 1, 3) AS b
      |  FROM (
      |    SELECT doc_id, source,
      |      unnest(ws || list_transform(range(1, len(ws)),
      |        i -> ws[i] || ' ' || ws[i + 1])) AS gram
      |    FROM w)),
      |bc AS (
      |  SELECT b,
      |    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
      |    CAST(SUM(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS cr
      |  FROM g GROUP BY b),
      |tot AS (
      |  SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr
      |  FROM bc),
      |lr AS (
      |  SELECT b,
      |    ln((CAST(ct + 1 AS DOUBLE) / CAST(cr + 1 AS DOUBLE))
      |       * (CAST(tr + 4096 AS DOUBLE) / CAST(tt + 4096 AS DOUBLE))) AS lr
      |  FROM bc, tot),
      |dw AS (
      |  SELECT doc_id, COUNT(*) AS n_grams, SUM(lr) AS slw
      |  FROM g JOIN lr USING (b) WHERE NOT is_t GROUP BY doc_id),
      |sel AS (
      |  SELECT d.doc_id, doc.source, d.n_grams,
      |    round(d.slw, 6) AS log_w,
      |    round(d.slw - ln(-ln(
      |      (CAST(list_sum(list_transform(range(1, 7), i ->
      |         (strpos('0123456789abcdef', substr(
      |            substr(md5('dsir:' || CAST(d.doc_id AS VARCHAR)), 1, 6),
      |            i, 1)) - 1)
      |         * CAST(pow(16, 6 - i) AS BIGINT))) AS BIGINT) + 1)
      |      / 16777217.0)), 6) AS sel_key
      |  FROM dw d JOIN documents doc USING (doc_id))
      |SELECT doc_id, source, n_grams, log_w, sel_key
      |FROM sel ORDER BY sel_key DESC, doc_id LIMIT 100""".stripMargin

  /** q116 — DSIR selection MATERIALIZED: where q114 stops at ranked
    * weights + selection keys, this draws the actual Gumbel top-100
    * corpus subset (sampling-without-replacement ∝ importance weight,
    * the resampling step of arXiv:2302.03169) and emits the selected
    * documents themselves — id, source, lang, length, and an md5 of
    * the text so the oracle hash-checks the materialized content, not
    * just the ranking. Seeded Gumbel (md5 of the doc id), so the draw
    * replays bit-identically in DuckDB.
    *
    * Scale: TakeOrderedAndProject for the top-k (per-partition k-heap,
    * no global sort) + a broadcast of the 100 selected ids back onto
    * the corpus — the corpus itself never shuffles.
    */
  def dsirSelectCorpus(s: SparkSession, dir: String): DataFrame = {
    // deploy-aware (r17 full-run A/B: plain scan 2.13 s vs 1.51 s
    // spread locally, with the gram kernel serialized at toy scan
    // width; at cluster row-group splits the spread would only add a
    // full-corpus round-robin)
    val docs = Tables.loadSpreadLocal(s, dir, "documents")
    CurationOps.dsirSelect(
        docs, "doc_id", "text", col("source").isin("src0", "src1"), 100)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        md5(col("text")).as("text_md5"),
        col("n_grams"), col("log_w"), col("sel_key"))
      .orderBy(col("sel_key").desc, col("doc_id"))
  }

  val dsirSelectCorpusSql: String =
    """WITH w AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |g AS (
      |  SELECT doc_id, source IN ('src0', 'src1') AS is_t,
      |    substr(md5(gram), 1, 3) AS b
      |  FROM (
      |    SELECT doc_id, source,
      |      unnest(ws || list_transform(range(1, len(ws)),
      |        i -> ws[i] || ' ' || ws[i + 1])) AS gram
      |    FROM w)),
      |bc AS (
      |  SELECT b,
      |    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
      |    CAST(SUM(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS cr
      |  FROM g GROUP BY b),
      |tot AS (
      |  SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr
      |  FROM bc),
      |lr AS (
      |  SELECT b,
      |    ln((CAST(ct + 1 AS DOUBLE) / CAST(cr + 1 AS DOUBLE))
      |       * (CAST(tr + 4096 AS DOUBLE) / CAST(tt + 4096 AS DOUBLE))) AS lr
      |  FROM bc, tot),
      |dw AS (
      |  SELECT doc_id, COUNT(*) AS n_grams, SUM(lr) AS slw
      |  FROM g JOIN lr USING (b) WHERE NOT is_t GROUP BY doc_id),
      |sel AS (
      |  SELECT doc_id, n_grams, round(slw, 6) AS log_w,
      |    round(slw - ln(-ln(
      |      (CAST(list_sum(list_transform(range(1, 7), i ->
      |         (strpos('0123456789abcdef', substr(
      |            substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 6),
      |            i, 1)) - 1)
      |         * CAST(pow(16, 6 - i) AS BIGINT))) AS BIGINT) + 1)
      |      / 16777217.0)), 6) AS sel_key
      |  FROM dw
      |  ORDER BY sel_key DESC, doc_id LIMIT 100)
      |SELECT s.doc_id, d.source, d.lang, d.n_chars,
      |  md5(d.text) AS text_md5, s.n_grams, s.log_w, s.sel_key
      |FROM sel s JOIN documents d USING (doc_id)
      |ORDER BY s.sel_key DESC, s.doc_id""".stripMargin

  /** q120 — per-document contamination fraction: the share of each
    * raw document's distinct word 4-grams that appear anywhere in the
    * benchmark slice (`doc_id % 7 = 0`) — the release-report metric
    * the boolean decontamination passes (q36 phrase match, q87 Bloom)
    * only gate on. One gram-keyed equi-join + one doc-keyed count;
    * the fraction is a single exact-integer division, bit-identical
    * across engines. Gram-less documents surface with 0, not dropped.
    */
  def contaminationFrac(s: SparkSession, dir: String): DataFrame = {
    // deploy-aware (r17 full-run A/B: 2.40 s plain vs 1.58 s spread
    // locally — the k-gram array_distinct kernel is dense relative to
    // the degenerate toy scan width only)
    val docs = Tables.loadSpreadLocal(s, dir, "documents")
    CurationOps.contaminationFraction(
        docs, "doc_id", "text", col("doc_id") % 7 === 0, 4)
      .orderBy("doc_id")
  }

  val contaminationFracSql: String =
    """WITH t AS (
      |  SELECT doc_id, doc_id % 7 = 0 AS bm, string_split(text, ' ') AS ws
      |  FROM documents),
      |gr AS (
      |  SELECT doc_id, bm, u.g
      |  FROM t, LATERAL UNNEST(
      |    CASE WHEN len(ws) >= 4
      |      THEN list_distinct(list_transform(range(1, len(ws) - 2),
      |             i -> array_to_string(ws[i : i + 3], ' ')))
      |      ELSE [] END) AS u(g)),
      |bg AS (SELECT DISTINCT g FROM gr WHERE bm),
      |rh AS (
      |  SELECT r.doc_id, COUNT(*) AS n_grams,
      |    CAST(SUM(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      |  FROM (SELECT * FROM gr WHERE NOT bm) r
      |  LEFT JOIN bg USING (g) GROUP BY r.doc_id)
      |SELECT t.doc_id,
      |  CAST(COALESCE(rh.n_grams, 0) AS BIGINT) AS n_grams,
      |  CAST(COALESCE(rh.n_hit, 0) AS BIGINT) AS n_hit,
      |  CASE WHEN COALESCE(rh.n_grams, 0) > 0
      |       THEN CAST(rh.n_hit AS DOUBLE) / CAST(rh.n_grams AS DOUBLE)
      |       ELSE 0.0 END AS overlap_frac
      |FROM t LEFT JOIN rh ON t.doc_id = rh.doc_id
      |WHERE NOT t.bm
      |ORDER BY t.doc_id""".stripMargin

  /** q121 — token-budget greedy fill: keep the highest-entropy
    * documents until 40% of the corpus's TOKENS are spent (a budget
    * constraint, not q112's percentile — document sizes vary, so the
    * two cutoffs disagree). Bucketed prefix-sum plan: per-score-bucket
    * token totals (score rounded to 2 decimals → ≤ 801 buckets,
    * localCheckpoint-materialized before the broadcast), whole-bucket
    * keep/drop by comparison, and a within-bucket running sum ONLY for
    * the single boundary bucket — no global sort, no corpus-wide
    * window. Exact integer arithmetic + md5 tie order → both engines
    * select the identical document set.
    */
  def tokenBudgetFill(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    CurationOps.tokenBudgetSelect(docs, "doc_id", "text",
        round(NativeFunctions.byteEntropy(col("text")), 2), 40)
      .orderBy("doc_id")
  }

  val tokenBudgetFillSql: String =
    """WITH c AS (
      |  SELECT doc_id, substr(text, i, 1) AS ch
      |  FROM documents, LATERAL UNNEST(generate_series(1, length(text))) AS t(i)),
      |e AS (
      |  SELECT doc_id, round(entropy(ch), 2) AS score FROM c GROUP BY doc_id),
      |d AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    score
      |  FROM documents JOIN e USING (doc_id)),
      |b AS (SELECT score, SUM(n_tokens) AS btok FROM d GROUP BY score),
      |pc AS (
      |  SELECT score, btok,
      |    SUM(btok) OVER (ORDER BY score DESC) - btok AS prev
      |  FROM b),
      |tt AS (SELECT SUM(n_tokens) AS tot FROM d),
      |j AS (
      |  SELECT d.doc_id, d.n_tokens, d.score, pc.prev, pc.btok,
      |    tt.tot * 40 // 100 AS budget
      |  FROM d JOIN pc USING (score), tt),
      |dec AS (
      |  SELECT doc_id, n_tokens, score, prev + btok <= budget AS kept
      |  FROM j WHERE prev >= budget OR prev + btok <= budget),
      |bnd AS (
      |  SELECT doc_id, n_tokens, score,
      |    prev + SUM(n_tokens) OVER (
      |      PARTITION BY score
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= budget AS kept
      |  FROM j WHERE prev < budget AND prev + btok > budget)
      |SELECT * FROM dec UNION ALL SELECT * FROM bnd
      |ORDER BY doc_id""".stripMargin

  /** q115 — per-source distribution drift: KL(source ‖ corpus) over
    * hashed-unigram buckets (the md5-prefix featurizer of q114), with
    * add-one smoothing on both sides, summed over the FULL fixed
    * 4096-bucket support (both distributions normalize over the same
    * support, so KL ≥ 0 holds — truncating to observed buckets would
    * break it). The standing monitoring metric of a training-data
    * pipeline — a source whose language drifts (new boilerplate, spam
    * injection, scraper breakage) shows a KL spike against the corpus
    * mixture long before any downstream eval moves.
    *
    * Scale: one unigram explode → one (source, bucket) count shuffle;
    * everything after lives on ≤ sources × 4096 rows (the grid is two
    * broadcast joins, never a wide shuffle). Each term's `ln` argument
    * is built from exact BIGINTs through correctly-rounded double ops
    * (q114 discipline), and the 6-decimal rounding absorbs
    * summation-order ulps.
    */
  def sourceKlDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    CurationOps.klDrift(docs, "source", "text")
      .withColumn("kl", round(col("kl"), 6))
      .orderBy(col("source"))
  }

  val sourceKlDriftSql: String =
    """WITH w AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |wb AS (SELECT source, substr(md5(w), 1, 3) AS bk FROM w),
      |sb AS (
      |  SELECT source, bk, CAST(COUNT(*) AS BIGINT) AS csb
      |  FROM wb GROUP BY source, bk),
      |ns AS (
      |  SELECT source, CAST(SUM(csb) AS BIGINT) AS nsrc
      |  FROM sb GROUP BY source),
      |cb AS (
      |  SELECT bk, CAST(SUM(csb) AS BIGINT) AS cbk FROM sb GROUP BY bk),
      |tot AS (SELECT CAST(SUM(cbk) AS BIGINT) AS nn FROM cb),
      |bks AS (
      |  SELECT lpad(lower(to_hex(i)), 3, '0') AS bk
      |  FROM (SELECT unnest(range(0, 4096)) AS i)),
      |grid AS (
      |  SELECT ns.source, ns.nsrc, bks.bk, COALESCE(cb.cbk, 0) AS cbk,
      |    tot.nn, COALESCE(sb.csb, 0) AS csb
      |  FROM ns CROSS JOIN bks CROSS JOIN tot
      |  LEFT JOIN cb ON cb.bk = bks.bk
      |  LEFT JOIN sb ON sb.source = ns.source AND sb.bk = bks.bk),
      |t AS (
      |  SELECT source, nsrc,
      |    (CAST(csb + 1 AS DOUBLE) / CAST(nsrc + 4096 AS DOUBLE)) *
      |    ln((CAST(csb + 1 AS DOUBLE) / CAST(cbk + 1 AS DOUBLE))
      |       * (CAST(nn + 4096 AS DOUBLE) / CAST(nsrc + 4096 AS DOUBLE))) AS term
      |  FROM grid)
      |SELECT source, nsrc AS n_grams, round(SUM(term), 6) AS kl
      |FROM t GROUP BY source, nsrc
      |ORDER BY source""".stripMargin

  /** q130 — the per-source DATA CARD: the release-report table every
    * corpus drop publishes (docs, chars, whitespace tokens, exact-dup
    * exposure, language spread, quality-gate pass rate per source).
    * Duplication is measured corpus-WIDE (a doc is exposed if its
    * md5(text) appears anywhere else, crediting each source with its
    * own copies), so a source mirroring another's content shows a
    * high dup_ppm even if it never repeats itself.
    *
    * Determinism: counts and sums are integers; rates are fixed-point
    * ppm via integer division; the quality gate reuses q21's exact
    * double chain (proven engine-identical). Scale shape: ONE
    * fingerprint aggregate (hash-keyed) + ONE doc-keyed join back +
    * ONE source-keyed aggregate — the same two-shuffle budget at any
    * corpus size; no windows, no collects.
    */
  def sourceDatacard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextOps.{words, markerCount, fingerprint}
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    val docs = Tables.load(s, dir, "documents")
    val w = words($"text")
    val nTok = size(w).cast("double")
    val q = markerCount(w, stop).cast("double") / nTok * 2.0 +
      size(array_distinct(w)).cast("double") / nTok * 1.0 +
      ($"n_chars" - (size(w) - 1)).cast("double") / nTok * 0.1
    val perDoc = docs.select($"doc_id", $"source", $"lang", $"n_chars",
      size(w).cast("long").as("toks"), fingerprint($"text").as("h"),
      (q >= 0.6).as("passes"))
    val hashCounts = perDoc.groupBy($"h").agg(count(lit(1)).as("copies"))
    perDoc.join(hashCounts, "h")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        sum($"toks").as("total_tokens"),
        sum(when($"copies" > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        countDistinct($"lang").as("n_langs"),
        sum(when($"passes", 1L).otherwise(0L)).as("n_quality"))
      .select($"source", $"n_docs", $"total_chars", $"total_tokens",
        expr("total_chars div n_docs").as("mean_chars"),
        $"n_dup_docs",
        expr("n_dup_docs * 1000000 div n_docs").as("dup_ppm"),
        $"n_langs",
        expr("n_quality * 1000000 div n_docs").as("quality_ppm"))
      .orderBy($"source")
  }

  val sourceDatacardSql: String =
    """WITH d AS (
      |  SELECT doc_id, source, lang, n_chars,
      |    len(string_split(text, ' ')) AS toks,
      |    md5(text) AS h,
      |    (CAST(len(list_filter(string_split(text, ' '),
      |        x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE)
      |       / CAST(len(string_split(text, ' ')) AS DOUBLE) * 2.0
      |     + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |       / CAST(len(string_split(text, ' ')) AS DOUBLE) * 1.0
      |     + CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      |       / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.1) >= 0.6 AS passes
      |  FROM documents),
      |hc AS (SELECT h, COUNT(*) AS copies FROM d GROUP BY h),
      |agg AS (
      |  SELECT source,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |    CAST(SUM(toks) AS BIGINT) AS total_tokens,
      |    CAST(SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
      |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |    CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
      |  FROM d JOIN hc USING (h)
      |  GROUP BY source)
      |SELECT source, n_docs, total_chars, total_tokens,
      |  total_chars // n_docs AS mean_chars,
      |  n_dup_docs,
      |  n_dup_docs * 1000000 // n_docs AS dup_ppm,
      |  n_langs,
      |  n_quality * 1000000 // n_docs AS quality_ppm
      |FROM agg
      |ORDER BY source""".stripMargin

  /** q149: cross-source score normalization — a score is only
    * comparable ACROSS sources after per-source calibration (a "long"
    * doc on a short-form source is an outlier; the same length on a
    * book source is tiny). The scale-safe form of per-source
    * percent_rank: a 9-point `percentile_disc` decile grid per source
    * (bounded: |sources|×9 values, broadcast back), and each doc's
    * calibrated decile is the COUNT of grid points ≤ its score —
    * pure integers end to end, no per-source window sort of the
    * corpus, and the one exact-percentile aggregate swaps for
    * `approx_percentile` at 100 TB with everything else unchanged.
    */
  def scoreNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", $"source", $"n_chars")
    val grid = docs.groupBy($"source").agg(
      array((1 to 9).map(p =>
        expr(s"percentile_disc(0.$p) WITHIN GROUP (ORDER BY n_chars)")): _*)
        .as("grid"))
    docs.join(broadcast(grid), "source")
      .select($"doc_id", $"source", $"n_chars",
        expr("size(filter(grid, g -> g <= n_chars))").cast("long").as("decile"))
      .orderBy($"doc_id")
  }

  val scoreNormalizeSql: String = {
    val pts = (1 to 9).map(p =>
      s"percentile_disc(0.$p) WITHIN GROUP (ORDER BY n_chars)").mkString(",\n      |    ")
    s"""WITH g AS (
       |  SELECT source, [$pts] AS grid
       |  FROM documents GROUP BY source)
       |SELECT d.doc_id, d.source, d.n_chars,
       |  CAST(len(list_filter(g.grid, x -> x <= d.n_chars)) AS BIGINT) AS decile
       |FROM documents d JOIN g USING (source)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** q161: deterministic global shuffle + shard assignment — the LAST
    * stage of every training-data pipeline (the "shuffle and shard"
    * step before tokenization): each kept document gets a
    * reproducible pseudo-random (shard, pos) — the shard file it
    * lands in and its offset within that file — derived ONLY from its
    * id and a seed constant, so two runs (or two engines) emit the
    * identical training order, and a resumed/partial re-run places
    * every document exactly where the first run did.
    *
    * Permutation key = md5(seed || doc_id); shard = first-16-bits mod
    * k (uniform by construction; the conv↔strpos hex decode is the
    * q114 DSIR convention); pos = rank of the key within the shard.
    * Scale shape: no driver state, and the only semantic ordering
    * work is the per-shard rank, whose window partition is capped BY
    * CONSTRUCTION — k is DERIVED from the corpus row count
    * ([[shardCount]]: ceil(n / [[ShardDocs]]), floored at 8), so a
    * shard stays file-sized at any corpus size (100 TB ⇒ k ≈ 10⁵;
    * the q113 per-doc-window boundedness argument with the shard
    * file in the document's role — a shard is written sequentially
    * by one task anyway, so the rank costs nothing extra). The floor
    * is what the DuckDB oracle mirrors (`% 8`), and it is the value
    * at every oracle/probe scale by construction (binds only past
    * 8·ShardDocs documents) — the q97/q123 inert-bound convention.
    * The closing `.orderBy(shard, pos)` is the deterministic
    * PRESENTATION order the hash-compare gate requires of every
    * registered query, not part of the operator: the production
    * shape writes `partitionBy(shard)` + `sortWithinPartitions(pos)`
    * — shard-local sorts, no global exchange.
    */
  def trainingShuffle(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val k = shardCount(docs.count())
    // This registered def IS the hash-compare gate, and the DuckDB
    // oracle hard-codes the k=8 floor. The floor binds at every scale
    // the gate runs by construction (k grows only past 8·ShardDocs
    // docs), but "by construction" must fail LOUDLY if it ever stops
    // holding — a silently diverging fixed-modulus oracle is the exact
    // class the schema guard exists for. Production callers with a
    // bigger corpus use [[shardAssignment]] with their derived k.
    require(k == 8L, s"trainingShuffle oracle gate: derived shard count $k != " +
      s"the oracle's fixed modulus 8 — corpus exceeds ${8 * ShardDocs} docs; " +
      "use shardAssignment(docs, k) directly (no fixed-k oracle exists)")
    shardAssignment(docs, k).orderBy(col("shard"), col("pos"))
  }

  /** Production face of q161: the deterministic (shard, pos)
    * assignment for an explicit shard count — no count() pass, no
    * presentation orderBy (the production write is `partitionBy(shard)
    * + sortWithinPartitions(pos)`, shard-local sorts only, which
    * ShardWriteSpec executes and asserts against the physical plan).
    */
  def shardAssignment(docs: DataFrame, k: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("shuffle-v1:"), col("doc_id").cast("string")))
    docs
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard",
        pmod(conv(substring(col("h"), 1, 4), 16, 10).cast("long"), lit(k)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Target shard payload for [[trainingShuffle]]: ~docs per shard
    * file. With k = ceil(n / ShardDocs) a window partition never
    * exceeds ~ShardDocs rows regardless of corpus size — the bound
    * the per-shard rank's safety rests on, ENFORCED (not asserted)
    * like the q97/q123 training caps.
    */
  private[graft] val ShardDocs = 100000L

  /** Shard count for an n-document corpus: ceil(n / [[ShardDocs]]),
    * floored at 8 (the oracle-mirrored value; the floor binds at
    * every scale the DuckDB gate or the sf1 probe runs — k only
    * grows past 8·ShardDocs docs, where no fixed-k oracle exists).
    */
  private[graft] def shardCount(n: Long): Long =
    math.max(8L, (n + ShardDocs - 1L) / ShardDocs)

  val trainingShuffleSql: String =
    """WITH h AS (
      |  SELECT doc_id, md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, h,
      |    CAST(list_sum(list_transform(range(1, 5), i ->
      |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
      |      * CAST(pow(16, 4 - i) AS BIGINT))) AS BIGINT) % 8 AS shard
      |  FROM h)
      |SELECT doc_id, shard,
      |  row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
      |FROM s ORDER BY shard, pos""".stripMargin

  val defs: Map[String, Q] = Map(
    "q161_training_shuffle" -> (trainingShuffle(_, _)),
    "q149_score_normalize" -> (scoreNormalize(_, _)),
    "q107_substring_dedup" -> (substringDedup(_, _)),
    "q173_exact_substring_remove" -> (exactSubstringRemove(_, _)),
    "q167_quality_classifier" -> (qualityClassifier(_, _)),
    "q108_chunk_documents" -> (chunkDocuments(_, _)),
    "q109_group_regression" -> (groupRegression(_, _)),
    "q110_char_entropy" -> (charEntropy(_, _)),
    "q111_winnow_fingerprints" -> (winnowFingerprints(_, _)),
    "q112_quality_percentile_filter" -> (qualityPercentileFilter(_, _)),
    "q113_winnow_near_dup" -> (winnowNearDup(_, _)),
    "q114_dsir_resample" -> (dsirResample(_, _)),
    "q115_source_kl_drift" -> (sourceKlDrift(_, _)),
    "q116_dsir_select" -> (dsirSelectCorpus(_, _)),
    "q120_contamination_frac" -> (contaminationFrac(_, _)),
    "q121_token_budget_fill" -> (tokenBudgetFill(_, _)),
    "q130_source_datacard" -> (sourceDatacard(_, _)))

  val oracles: Map[String, String] = Map(
    "q161_training_shuffle" -> trainingShuffleSql,
    "q149_score_normalize" -> scoreNormalizeSql,
    "q107_substring_dedup" -> substringDedupSql,
    "q173_exact_substring_remove" -> exactSubstringRemoveSql,
    "q167_quality_classifier" -> qualityClassifierSql,
    "q108_chunk_documents" -> chunkDocumentsSql,
    "q109_group_regression" -> groupRegressionSql,
    "q110_char_entropy" -> charEntropySql,
    "q111_winnow_fingerprints" -> winnowFingerprintsSql,
    "q112_quality_percentile_filter" -> qualityPercentileFilterSql,
    "q113_winnow_near_dup" -> winnowNearDupSql,
    "q114_dsir_resample" -> dsirResampleSql,
    "q115_source_kl_drift" -> sourceKlDriftSql,
    "q116_dsir_select" -> dsirSelectCorpusSql,
    "q120_contamination_frac" -> contaminationFracSql,
    "q121_token_budget_fill" -> tokenBudgetFillSql,
    "q130_source_datacard" -> sourceDatacardSql)
}
