package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.CurationOps
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
    val docs = Tables.load(s, dir, "documents")
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
    val li = Tables.load(s, dir, "lineitem")
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
      |  SELECT s.s_nationkey, l.l_quantity AS x, l.l_extendedprice AS y
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |m AS (
      |  SELECT s_nationkey,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(12,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x AS DECIMAL(12,2)) * CAST(y AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(x AS DECIMAL(12,2)) * CAST(x AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y AS DECIMAL(12,2)) * CAST(y AS DECIMAL(12,2))) AS DOUBLE) AS syy
      |  FROM j GROUP BY s_nationkey),
      |f AS (
      |  SELECT s_nationkey, n, sx, sy,
      |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      |    ((n * sxy - sx * sy) * (n * sxy - sx * sy))
      |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      |  FROM m)
      |SELECT nt.n_name AS nation, CAST(f.n AS BIGINT) AS n,
      |  round(f.slope, 8) AS slope,
      |  round((f.sy - f.slope * f.sx) / f.n, 8) AS intercept,
      |  round(f.r2, 8) AS r2
      |FROM f JOIN nation nt ON f.s_nationkey = nt.n_nationkey
      |ORDER BY nation""".stripMargin

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
    val docs = Tables.load(s, dir, "documents")
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
    */
  def winnowNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val fp = CurationOps.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .select("doc_id", "fp").distinct()
    val rare = fp.groupBy("fp").agg(count(lit(1)).as("dfp"))
      .filter(col("dfp") <= 50).select("fp")
    val fpk = fp.join(rare, "fp")
    val cand = fpk.select(col("fp"), col("doc_id").as("i"))
      .join(fpk.select(col("fp"), col("doc_id").as("j")), "fp")
      .where(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n_shared_fp"))
      .filter(col("n_shared_fp") >= 3)
    val w = split(col("text"), " ")
    val positions = when(size(w) >= 4, sequence(lit(1), size(w) - 3))
      .otherwise(array().cast("array<int>"))
    val gs = docs.select(
      col("doc_id"),
      explode(transform(positions, i =>
        array_join(slice(w, i, lit(4)), " "))).as("gram"))
      .distinct()
    val gcnt = gs.groupBy("doc_id").agg(count(lit(1)).as("ng"))
    val inter = cand
      .join(gs.select(col("doc_id").as("i"), col("gram")), "i")
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

  val defs: Map[String, Q] = Map(
    "q107_substring_dedup" -> (substringDedup(_, _)),
    "q108_chunk_documents" -> (chunkDocuments(_, _)),
    "q109_group_regression" -> (groupRegression(_, _)),
    "q110_char_entropy" -> (charEntropy(_, _)),
    "q111_winnow_fingerprints" -> (winnowFingerprints(_, _)),
    "q112_quality_percentile_filter" -> (qualityPercentileFilter(_, _)),
    "q113_winnow_near_dup" -> (winnowNearDup(_, _)))

  val oracles: Map[String, String] = Map(
    "q107_substring_dedup" -> substringDedupSql,
    "q108_chunk_documents" -> chunkDocumentsSql,
    "q109_group_regression" -> groupRegressionSql,
    "q110_char_entropy" -> charEntropySql,
    "q111_winnow_fingerprints" -> winnowFingerprintsSql,
    "q112_quality_percentile_filter" -> qualityPercentileFilterSql,
    "q113_winnow_near_dup" -> winnowNearDupSql)
}
