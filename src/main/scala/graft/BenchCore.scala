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
  *
  * Round 12 additions, after BENCH_r11 died rc=124 with nothing
  * written: the warmup pass can be fed back in as each query's first
  * sample (`seed`) so one whole pass of wall time is saved without
  * giving up min-of-3, and every run is guarded by `outOfBudget` so
  * the caller can enforce a hard wall-clock deadline — when the
  * budget trips, measurement stops where it is and whatever samples
  * exist are summarized instead of lost.
  */
object BenchCore {

  /** One query's measurement: best wall seconds, raw-pass spread
    * (max/min of the timed passes, excluding any seeded warmup sample,
    * before any rerun; 1.0 when all passes agree or fewer than two
    * passes ran, -1 when every sample failed), rerun count, and every
    * sample taken (seed first when present).
    *
    * `min == -1` is overloaded by callers' runners ("this query
    * failed"), so [[truncated]] distinguishes the other -1 case: the
    * wall-clock budget tripped before this query took ANY sample.
    * A truncated query is unmeasured, not broken — downstream readers
    * (bench JSON, round-over-round diffs) must not count it as a
    * failure.
    */
  final case class QueryResult(
      min: Double, spread: Double, reruns: Int, samples: Seq[Double]) {
    def truncated: Boolean = samples.isEmpty
  }

  /** Run `names` through timed passes of `run` (which returns wall
    * seconds, or a negative value on failure), then re-measure
    * outliers. Pass-major order: queries interleave across passes so a
    * transient load spike hits one pass of many queries rather than
    * all passes of one.
    *
    * `seed` supplies an already-taken sample per query (the warmup
    * pass); a seeded query then gets `passes - 1` timed passes, so
    * `passes` is always the target sample count. Seed samples pay the
    * JIT/codegen cost (they are COLD), so a cold seed can't beat a
    * warm pass and including it in the min is harmless — but it is
    * excluded from the spread, otherwise every query would look like
    * an outlier and the rerun logic would burn the budget the seeding
    * saved. A FAILED warmup (negative seed value) is ignored entirely
    * rather than occupying a sample slot, so that query still gets the
    * full `passes` timed chances at a valid measurement.
    *
    * `outOfBudget` is consulted before every individual run (passes
    * and reruns); once it returns true no further work is started and
    * the samples already taken are summarized.
    */
  def measure(
      names: Seq[String],
      run: String => Double,
      passes: Int = 3,
      spreadThreshold: Double = 3.0,
      maxReruns: Int = 2,
      cleanFactor: Double = 1.5,
      outOfBudget: () => Boolean = () => false,
      seed: Map[String, Double] = Map.empty): Map[String, QueryResult] = {
    val validSeed = seed.filter(_._2 >= 0)
    val acc = collection.mutable.LinkedHashMap(
      names.map(n => n -> validSeed.get(n).toVector): _*)
    var pass = 0
    while (pass < passes && !outOfBudget()) {
      names.foreach { n =>
        if (acc(n).size < passes && !outOfBudget()) acc(n) :+= run(n)
      }
      pass += 1
    }
    names.map { name =>
      val all = acc(name)
      val seeded = validSeed.contains(name)
      val timed = if (seeded) all.drop(1) else all
      val ok = all.filter(_ >= 0)
      val timedOk = timed.filter(_ >= 0)
      if (ok.isEmpty) {
        name -> QueryResult(-1.0, -1.0, 0, all)
      } else {
        val spread =
          if (timedOk.size < 2 || timedOk.min <= 0) 1.0
          else timedOk.max / timedOk.min
        var best = ok.min
        var extra = List.empty[Double]
        if (spread > spreadThreshold) {
          var clean = false
          while (!clean && extra.size < maxReruns && !outOfBudget()) {
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
