package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output-dialect handling (SURVEY §7.4 item 5).
  *
  * The engine computes ONE canonical lowercase schema; the reference's
  * legacy dialect (`use_old_formatting`, v3/vars.py:172-179 —
  * capitalized names, `bid`→`CloseBid`, `ask`→`CloseAsk`,
  * `timestamp`/`datetime` index name `Datetime`, v2.py:700, 897, 1529)
  * is a zero-cost rename VIEW over it, never a second pipeline.
  */
object Formatting {

  /** P1 — legacy renames (v3/utils.py:382-391). */
  private val special = Map(
    "bid" -> "CloseBid",
    "ask" -> "CloseAsk",
    "datetime" -> "Datetime",
    "timestamp" -> "Datetime",
    "bid_size" -> "Bid_size",
    "ask_size" -> "Ask_size",
    "weighted_midpoint" -> "Weighted_midpoint",
    "open_interest" -> "Open_interest")

  def legacyName(c: String): String =
    special.getOrElse(c.toLowerCase, c.toLowerCase.capitalize)

  /** Canonical frame → legacy-dialect view. */
  def toLegacy(df: DataFrame): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c => col(c).as(legacyName(c))): _*)

  /** Legacy frame → canonical lowercase schema (the normalization
    * direction of v3/utils.py:297-299).
    */
  def toCanonical(df: DataFrame): DataFrame = {
    val inverse = special.map(_.swap)
    df.select(df.columns.toIndexedSeq.map(c =>
      col(c).as(inverse.getOrElse(c, c.toLowerCase))): _*)
  }
}

/** R3 — the data-correction "patch" framework
  * (reference patches/main.py:9-114: a registry of `func_name →
  * [patch]`, each patch a result-transform applied after the
  * operator).
  *
  * Patches are plain `DataFrame => DataFrame` values; data-level
  * corrections (like the AAPL bogus list-dates entry,
  * patches/p1.py:5-101) are expressed as a broadcast anti-join
  * against a corrections table — declarative, so Catalyst can still
  * optimize through them.
  */
object Patches {

  type Patch = DataFrame => DataFrame

  /** Apply the registered patch chain for `queryName`. */
  def applyAll(registry: Map[String, Seq[Patch]], queryName: String,
      df: DataFrame): DataFrame =
    registry.getOrElse(queryName, Nil).foldLeft(df)((d, p) => p(d))

  /** The standard correction patch: remove rows matching the
    * corrections table on `keys` (broadcast anti-join).
    */
  def removeCorrections(corrections: DataFrame, keys: Seq[String]): Patch =
    df => df.join(
      org.apache.spark.sql.functions.broadcast(corrections.select(keys.map(col): _*)),
      keys, "left_anti")

  /** The AAPL split-artifact rule (patches/p1.py:33-62), generalized:
    * drop `markerDate` rows of a key when the key's date set shows the
    * vendor's out-of-sequence signature — marker present, `firstValid`
    * present, and NONE of `gapDays` present. (The reference's
    * positional marker-before-valid check is inherent here: dates
    * order chronologically and marker < firstValid.)
    *
    * Declarative form: per-key conditional aggregate → broadcast of
    * qualifying keys → filter. One shuffle for the tiny key-level
    * aggregate, no collect — the 100 TB shape of a data correction.
    */
  def removeSplitArtifact(keyCol: String, dateCol: String,
      markerDate: String, firstValid: String, gapDays: Seq[String]): Patch = df => {
    import org.apache.spark.sql.functions._
    val d = col(dateCol)
    val qualifying = df.groupBy(col(keyCol))
      .agg(
        max(when(d === lit(markerDate), 1).otherwise(0)).as("__has_marker"),
        max(when(d === lit(firstValid), 1).otherwise(0)).as("__has_valid"),
        max(when(d.isin(gapDays: _*), 1).otherwise(0)).as("__has_gap"))
      .filter(col("__has_marker") === 1 && col("__has_valid") === 1 &&
        col("__has_gap") === 0)
      .select(col(keyCol), lit(1).as("__qual"))
    df.join(broadcast(qualifying), Seq(keyCol), "left")
      .filter(col("__qual").isNull || d =!= lit(markerDate))
      .drop("__qual")
  }
}
