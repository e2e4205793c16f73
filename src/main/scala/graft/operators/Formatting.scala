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
    df.select(df.columns.map(c => col(c).as(legacyName(c))): _*)

  /** Legacy frame → canonical lowercase schema (the normalization
    * direction of v3/utils.py:297-299).
    */
  def toCanonical(df: DataFrame): DataFrame = {
    val inverse = special.map(_.swap)
    df.select(df.columns.map(c =>
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
}
