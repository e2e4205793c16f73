package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.MultimodalOps

/** End-to-end pipeline surfaces: the multimodal batch-extract stage
  * and the plain-SQL entry point (§3.3 — the reference delegates SQL
  * strings to MySQL; here Catalyst parses/optimizes/executes).
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Multimodal feature pipeline: documents → binary media column +
    * typed metadata → partition-wise feature extraction (mapInPandas
    * analog; codec stubbed deterministically) → per-kind rollup.
    * Oracle-checked: the stub codec's byte-sum checksum and brightness
    * are DuckDB-expressible over the UTF-8 payload (codepoint sums
    * equal byte sums on this ASCII corpus), so the whole mapPartitions
    * stage is verified end-to-end, not just rows-only.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.loadSpread(s, dir, "documents")
    val media = MultimodalOps.packMedia(docs, "doc_id", "text")
    val features = MultimodalOps.extractFeatures(media)
    features.groupBy($"kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").as("total_bytes"),
        sum($"checksum").as("total_checksum"),
        (sum($"brightness".cast("decimal(30,12)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_brightness"),
        sum($"n_frames").as("total_frames"))
      .orderBy($"kind")
  }

  val multimodalFeaturesSql: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
      |    CAST(len(text) AS BIGINT) AS n_bytes,
      |    CAST(list_aggregate(
      |      list_transform(range(1, len(text) + 1), i -> ord(text[i])),
      |      'sum') AS BIGINT) AS checksum,
      |    (doc_id % 90000) // 1000 + 1 AS n_frames
      |  FROM documents),
      |g AS (
      |  SELECT *,
      |    CASE WHEN n_bytes = 0 THEN 0.0
      |         ELSE CAST(checksum AS DOUBLE) / n_bytes / 255.0 END AS brightness
      |  FROM f)
      |SELECT kind,
      |  COUNT(*) AS n_media,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(SUM(checksum) AS BIGINT) AS total_checksum,
      |  CAST(SUM(CAST(brightness AS DECIMAL(30,12))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS avg_brightness,
      |  CAST(SUM(n_frames) AS BIGINT) AS total_frames
      |FROM g GROUP BY kind ORDER BY kind""".stripMargin

  /** §3.3 — ad-hoc SQL over the registered catalog: the engine's
    * `spark.sql` surface, written in the ANSI subset both engines
    * parse, so the SAME string is the oracle.
    */
  val sqlSurfaceText: String =
    """SELECT n_name,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  def sqlSurface(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(sqlSurfaceText)
  }

  val defs: Map[String, Q] = Map(
    "q44_multimodal_features" -> (multimodalFeatures(_, _)),
    "q45_sql_surface" -> (sqlSurface(_, _)))

  val oracles: Map[String, String] = Map(
    "q44_multimodal_features" -> multimodalFeaturesSql,
    "q45_sql_surface" -> sqlSurfaceText)
}
