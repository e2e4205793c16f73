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

  private val millisPerUnit = Map(
    "ms" -> 1L, "s" -> 1000L, "m" -> 60000L, "h" -> 3600000L,
    "d" -> 86400000L, "b" -> 86400000L, "M" -> 2592000000L,
    "Q" -> 7776000000L, "q" -> 7776000000L, "y" -> 31536000000L)

  /** F6 — `convert_string_interval_to_miliseconds` (utils.py:496-510,
    * map at :464-474): "5m" → 300000. Lookup is exact-key first, then
    * lowercase — the reference lowercases BEFORE its lookup, which
    * makes its own "M"/"Q" month/quarter entries unreachable
    * (utils.py:505 `unit.lower()`); exact-first restores them while
    * matching every reachable reference result. "ms" is an engine
    * extension: v3's VALID_INTERVALS (vars.py:200-216) enumerates
    * 10ms/100ms/500ms but the reference's own converter has no "ms"
    * entry and would raise on them — here every enumerated interval
    * except "tick" converts, and [[validateInterval]] is the gate.
    */
  def intervalToMillis(timeframe: String): Long = {
    val (unit, n) = extractNumericValue(timeframe)
    val ms = millisPerUnit.get(unit)
      .orElse(millisPerUnit.get(unit.toLowerCase))
      .getOrElse(throw new IllegalArgumentException(s"Unsupported time unit: $unit"))
    n * ms
  }

  /** The v3 interval surface (vars.py:200-216), finest first. */
  val validIntervals: Seq[String] = Seq(
    "tick", "10ms", "100ms", "500ms", "1s", "5s", "10s", "15s", "30s",
    "1m", "5m", "10m", "15m", "30m", "1h")

  /** The resample minimum-grain gate (v3/utils.py:311-313): an
    * interval below `minimum` raises with the reference's message.
    * The reference derives its minimum from
    * PRICING_CONFIG["INTRADAY_AGG"] (vars.py:198 —
    * MINIMUM_MILLISECONDS), an external config; here the caller
    * passes it. The default minimum "1s" rejects everything finer:
    * the sub-second enumerated grains (10ms/100ms/500ms) and "tick"
    * (treated as 0 ms, the raw feed it names) — pass a finer
    * `minimum` to admit them, as IntervalsSpec exercises. Returns
    * the interval's milliseconds.
    */
  def validateInterval(timeframe: String, minimum: String = "1s"): Long = {
    val ms = if (timeframe == "tick") 0L else intervalToMillis(timeframe)
    if (ms < intervalToMillis(minimum))
      throw new IllegalArgumentException(
        s"Interval $timeframe is too small. Minimum allowed is $minimum")
    ms
  }

  private val sparkUnit = Map(
    "ms" -> "milliseconds", "s" -> "seconds", "m" -> "minutes",
    "h" -> "hours", "d" -> "days", "b" -> "days", "w" -> "weeks")

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
