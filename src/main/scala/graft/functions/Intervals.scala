package graft.functions

/** Interval-string helpers (SURVEY §2.7 F2/F3/F6) — engine-level
  * config parsing, not column functions, exactly as the survey maps
  * them.
  */
object Intervals {

  /** F2 — `extract_numeric_value` (utils.py:457-461): "5m" → ("m", 5). */
  def extractNumericValue(timeframe: String): (String, Int) =
    "(\\d+)([a-zA-Z]+)".r.findFirstMatchIn(timeframe) match {
      case Some(m) => (m.group(2), m.group(1).toInt)
      case None =>
        throw new IllegalArgumentException(s"Bad timeframe: $timeframe")
    }

  private val rtMinutes = Map("m" -> 1, "h" -> 60, "d" -> 1440, "w" -> 10080)
  private val tradingUnits = Map("d" -> 1, "w" -> 5, "m" -> 30, "y" -> 252, "q" -> 91)

  /** F3 — `identify_length` (utils.py:231-257): timeframe → minutes
    * when `rt`, else trading-calendar units (days 1, weeks 5, months
    * 30, quarters 91, years 252).
    */
  def identifyLength(unit: String, n: Int, rt: Boolean = false): Int = {
    val map = if (rt) rtMinutes else tradingUnits
    map.get(unit) match {
      case Some(v) => n * v
      case None => throw new IllegalArgumentException(
        s"Available timeframes are ${map.keys.mkString(",")}, received $unit")
    }
  }

  private val secondsPerUnit = Map(
    "s" -> 1L, "m" -> 60L, "h" -> 3600L, "d" -> 86400L, "b" -> 86400L,
    "M" -> 2592000L, "Q" -> 7776000L, "q" -> 7776000L, "y" -> 31536000L)

  /** F6 — `convert_string_interval_to_miliseconds` (utils.py:464-509,
    * map at :464-474): "5m" → 300000. Lookup is exact-key first, then
    * lowercase — the reference lowercases BEFORE its lookup, which
    * makes its own "M"/"Q" month/quarter entries unreachable
    * (utils.py:505 `unit.lower()`); exact-first restores them while
    * matching every reachable reference result.
    */
  def intervalToMillis(timeframe: String): Long = {
    val (unit, n) = extractNumericValue(timeframe)
    val sec = secondsPerUnit.get(unit)
      .orElse(secondsPerUnit.get(unit.toLowerCase))
      .getOrElse(throw new IllegalArgumentException(s"Unsupported time unit: $unit"))
    n * sec * 1000L
  }

  private val sparkUnit = Map(
    "s" -> "seconds", "m" -> "minutes", "h" -> "hours", "d" -> "days",
    "b" -> "days", "w" -> "weeks")

  /** Compact reference timeframe → Spark interval string
    * ("5m" → "5 minutes") for `window()`/resample calls.
    */
  def toSparkInterval(timeframe: String): String = {
    val (unit, n) = extractNumericValue(timeframe)
    val u = sparkUnit.getOrElse(unit.toLowerCase,
      throw new IllegalArgumentException(s"Unsupported time unit: $unit"))
    s"$n $u"
  }
}
