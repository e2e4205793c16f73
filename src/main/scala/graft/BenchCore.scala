package graft

/** Measurement core behind [[Bench]], separated so the outlier logic is
  * unit-testable with injected (fake) runners.
  *
  * This box's noise band is wide enough to manufacture phantom
  * regressions: identical binaries have differed 42% between whole
  * runs, and single passes have spiked 47× (52 s vs a 1.1 s min).
  * min-of-N rescues the headline number, but a noisy pass set still
  * reads as "maybe a regression" to anyone comparing rounds. So: any
  * query whose pass spread (max/min) exceeds `spreadThreshold` is
  * re-measured up to `maxReruns` more times, stopping early once a
  * re-run lands within `cleanFactor` of the running min — a clean
  * confirmation that the min is reproducible, not a fluke. The
  * emitted per-query {min, spread, reruns} lets a future reader
  * distinguish "consistently slower" (small spread, no reruns, higher
  * min) from "loaded box" (huge spread, reruns that reconfirm the old
  * min) without a bisect.
  */
object BenchCore {

  /** One query's measurement: best wall seconds, raw-pass spread
    * (max/min before any rerun; 1.0 when all passes agree, -1 when
    * every pass failed), rerun count, and every sample taken.
    */
  final case class QueryResult(
      min: Double, spread: Double, reruns: Int, samples: Seq[Double])

  /** Run `names` through `passes` timed passes of `run` (which returns
    * wall seconds, or a negative value on failure), then re-measure
    * outliers. Pass-major order matches the original bench loop:
    * queries interleave across passes so a transient load spike hits
    * one pass of many queries rather than all passes of one.
    */
  def measure(
      names: Seq[String],
      run: String => Double,
      passes: Int = 3,
      spreadThreshold: Double = 3.0,
      maxReruns: Int = 2,
      cleanFactor: Double = 1.5): Map[String, QueryResult] = {
    val raw: Seq[Map[String, Double]] =
      Seq.fill(passes)(names.map(n => n -> run(n)).toMap)
    names.map { name =>
      val all = raw.map(_(name))
      val ok = all.filter(_ >= 0)
      if (ok.isEmpty) {
        name -> QueryResult(-1.0, -1.0, 0, all)
      } else {
        val spread = if (ok.min > 0) ok.max / ok.min else 1.0
        var best = ok.min
        var extra = List.empty[Double]
        if (spread > spreadThreshold) {
          var clean = false
          while (!clean && extra.size < maxReruns) {
            val t = run(name)
            extra ::= t
            if (t >= 0) {
              clean = t <= best * cleanFactor
              if (t < best) best = t
            }
          }
        }
        name -> QueryResult(best, spread, extra.size, all ++ extra.reverse)
      }
    }.toMap
  }
}
