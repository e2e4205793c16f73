package graft.operators

/** Single-task exact-arithmetic k-means trainers for the bounded
  * (≤ TrainCap-row) ANN training samples — the executor-side kernel
  * behind q97's spherical k-means and the q123/q160 product-quantizer
  * codebooks.
  *
  * Why one task: the sample is bounded by construction (the
  * two-layer modulus + orderBy/limit cap), so training cost is
  * corpus-size-INDEPENDENT — and the distributed Lloyd loop it
  * replaces (per-iteration broadcast join + two keyed exchanges + a
  * lineage-cut checkpoint, ~2 jobs + 1 checkpoint per iteration) was
  * pure scheduling latency at that size: the r20 stage profile put
  * q160's training phase at ~2.6 s of sequential sub-100 ms jobs plus
  * inter-job gaps, against ~0.3 s of actual compute. Fusing
  * seeding + Lloyd into the single `mapPartitions` task the
  * farthest-first seeding already ran in collapses that to ONE job
  * (the guide's §1.2 order: fix the distributed algorithm before the
  * per-task work). Data never visits the driver except the final
  * M×KS-row codebook collect, which the literal-embedding contract
  * required anyway; a lost executor re-runs the one deterministic
  * task (scan → filter → limit → train), so the r18 lineage-cut
  * concern no longer applies — there is no multi-job loop state left
  * to lose.
  *
  * Every arithmetic step replays the distributed plan (and therefore
  * the DuckDB oracle CTEs) bit-identically:
  *  - distances are exact int64 squared L2;
  *  - assignment argmin is lexicographic (d2, ccid) — ties to the
  *    smallest ccid, exactly `min_by(struct(sv, ccid), struct(d2,
  *    ccid))`;
  *  - recenter means are long sums (order-independent) divided as
  *    doubles and rounded HALF_UP away from zero, exactly Spark's
  *    `round(sum(x)/count(*))` then `.cast("long")`;
  *  - empty clusters drop out of the next round exactly as a groupBy
  *    drops absent keys.
  * TrainKernelsSpec pins each rule against an independent in-test
  * reference; the end-to-end equality proof is the unchanged DuckDB
  * differential on q97/q123/q160.
  */
object TrainKernels {

  /** Exact int64 squared L2 — the kernel twin of the `sqDist`
    * zip_with/aggregate expression.
    */
  def d2(a: Array[Long], b: Array[Long]): Long = {
    var t = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); t += d * d; i += 1 }
    t
  }

  /** Spark's `round(x).cast("long")` on a double: BigDecimal HALF_UP
    * at scale 0 (away from zero), then truncating cast — integral
    * after rounding, so the cast is exact.
    */
  def roundToLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Farthest-first traversal over `rows` = (md5-hex of vec_id,
    * vec_id, vector): first pick = min (h, vec_id); each next pick
    * maximizes its min-distance to the chosen set, smallest vec_id on
    * ties. Returns the k chosen vectors in pick order (ccid = index+1).
    * Exactly the seeding the distributed path ran in its one
    * mapPartitions task.
    */
  def farthestFirst(rows: Array[(String, Long, Array[Long])],
      k: Int): Array[Array[Long]] = {
    val first = rows.minBy(t => (t._1, t._2))
    val chosen = scala.collection.mutable.ArrayBuffer(first)
    val minD = rows.map(r => d2(r._3, first._3))
    while (chosen.size < k) {
      var best = 0; var i = 1
      while (i < rows.length) {
        if (minD(i) > minD(best) ||
            (minD(i) == minD(best) && rows(i)._2 < rows(best)._2)) best = i
        i += 1
      }
      val nxt = rows(best); chosen += nxt
      var j = 0
      while (j < rows.length) {
        val d = d2(rows(j)._3, nxt._3)
        if (d < minD(j)) minD(j) = d
        j += 1
      }
    }
    chosen.map(_._3).toArray
  }

  /** One Lloyd round over fixed-ccid centroids: assign each vector to
    * its (d2, ccid)-lexicographic argmin, recenter every non-empty
    * cluster with round-to-long means, and return the surviving
    * (ccid, centroid) pairs ccid-ascending. `cents` pairs carry the
    * PREVIOUS round's ccids (not necessarily dense).
    */
  private def lloydRound(vecs: Array[Array[Long]],
      cents: Array[(Int, Array[Long])]): Array[(Int, Array[Long])] = {
    val dim = vecs(0).length
    val maxId = cents.map(_._1).max
    val sums = Array.ofDim[Long](maxId + 1, dim)
    val counts = new Array[Long](maxId + 1)
    var vi = 0
    while (vi < vecs.length) {
      val v = vecs(vi)
      // cents is ccid-ascending, so strict `<` keeps the smallest ccid
      // on d2 ties — the min_by(struct(d2, ccid)) rule
      var best = 0; var bestD = d2(v, cents(0)._2); var c = 1
      while (c < cents.length) {
        val d = d2(v, cents(c)._2)
        if (d < bestD) { best = c; bestD = d }
        c += 1
      }
      val id = cents(best)._1
      counts(id) += 1L
      val row = sums(id)
      var p = 0
      while (p < dim) { row(p) += v(p); p += 1 }
      vi += 1
    }
    (0 to maxId).iterator.filter(counts(_) > 0L).map { id =>
      val cnt = counts(id).toDouble
      id -> Array.tabulate(dim)(p => roundToLong(sums(id)(p).toDouble / cnt))
    }.toArray
  }

  /** Product-quantizer codebook: per-subspace farthest-first seeding
    * (KS codewords over the D-wide subvectors) + `iters` Lloyd rounds.
    * `rows` = (md5-hex, vec_id, full M·D vector). Returns (sub, ccid,
    * centroid) in sub-major / ccid-ascending order — the literal-array
    * order the ADC `element_at` indexing relies on.
    */
  def pqBook(rows: Array[(String, Long, Array[Long])], M: Int, D: Int,
      KS: Int, iters: Int): Seq[(Int, Int, Array[Long])] = {
    val out = Seq.newBuilder[(Int, Int, Array[Long])]
    for (sp <- 0 until M) {
      val sub = rows.map { case (h, id, v) =>
        (h, id, java.util.Arrays.copyOfRange(v, sp * D, (sp + 1) * D))
      }
      val vecs = sub.map(_._3)
      var cents = farthestFirst(sub, KS).zipWithIndex
        .map { case (cv, i) => (i + 1, cv) }
      for (_ <- 1 to iters) cents = lloydRound(vecs, cents)
      out ++= cents.map { case (ccid, cv) => (sp, ccid, cv) }
    }
    out.result()
  }

  /** Spherical k-means (q97): farthest-first seeds + `iters` Lloyd
    * rounds where every recentered mean is re-quantized onto the
    * 1e6-radius sphere — cvec = round(x / sqrt(Σx²) · 1e6), the exact
    * double-op order of the column expression it replaces. Returns
    * (ccid, centroid) ccid-ascending.
    */
  def sphericalKmeans(rows: Array[(String, Long, Array[Long])], k: Int,
      iters: Int): Seq[(Int, Array[Long])] = {
    val vecs = rows.map(_._3)
    var cents = farthestFirst(rows, k).zipWithIndex
      .map { case (cv, i) => (i + 1, cv) }
    for (_ <- 1 to iters) {
      cents = lloydRound(vecs, cents).map { case (id, cv0) =>
        var csq = 0L; var i = 0
        while (i < cv0.length) { csq += cv0(i) * cv0(i); i += 1 }
        val norm = math.sqrt(csq.toDouble)
        id -> cv0.map(x => roundToLong(x.toDouble / norm * 1e6))
      }
    }
    cents.toSeq
  }
}
