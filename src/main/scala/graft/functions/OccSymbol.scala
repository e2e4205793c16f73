package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OCC option symbology (reference: Alpaca.py:246-310).
  *
  * Generate: `SYM + YYMMDD + C|P + zero-padded strike*1000 (8 digits)`
  * — e.g. AAPL241220C00180000. Parse is the regex inverse. Both are
  * pure column expressions (format_string / regexp_extract), fully
  * codegen'd.
  */
object OccSymbol {

  /** Build the OCC tick from (root, expiration date, right, strike). */
  def generate(root: Column, expiration: Column, right: Column, strike: Column): Column =
    concat(
      root,
      date_format(expiration, "yyMMdd"),
      upper(substring(right, 1, 1)),
      lpad(round(strike * 1000).cast("long").cast("string"), 8, "0"))

  private val pat = "^([A-Z]+)([0-9]{6})([CP])([0-9]{8})$"

  /** Inverse of [[generate]]: root / expiration / right / strike. */
  def parseRoot(occ: Column): Column = regexp_extract(occ, pat, 1)

  def parseExpiration(occ: Column): Column =
    to_date(regexp_extract(occ, pat, 2), "yyMMdd")

  def parseRight(occ: Column): Column = regexp_extract(occ, pat, 3)

  def parseStrike(occ: Column): Column =
    regexp_extract(occ, pat, 4).cast("long").cast("double") / 1000.0
}
