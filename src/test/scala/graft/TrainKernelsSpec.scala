package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainKernels

/** The r20 fused trainer ([[TrainKernels]]) replaced the distributed
  * Lloyd loop behind q97/q123/q160 — same arithmetic, one task, ~20
  * fewer scheduling-latency jobs per query. This spec pins the fused
  * kernel against an INDEPENDENT in-test reference that mirrors the
  * replaced plan's semantics step by step (min_by(struct(d2, ccid))
  * argmin, round-to-long means via BigDecimal HALF_UP, empty-cluster
  * drops, per-subspace farthest-first seeding), on adversarial
  * synthetic data with distance ties, negative values, and clusters
  * engineered to empty out. The end-to-end equality proof stays the
  * DuckDB differential on q97/q123/q160; this guards the kernel's
  * internals against drift.
  */
class TrainKernelsSpec extends AnyFunSuite {

  // deterministic LCG so the fixture never depends on library RNGs
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  /** rows = (md5-hex of id, id, vector) exactly as the trainer sees. */
  private def mkRows(n: Int, dim: Int, seed: Long,
      spread: Long): Array[(String, Long, Array[Long])] = {
    val it = lcg(seed)
    (0 until n).map { i =>
      val v = Array.fill(dim)((it.next() % spread))
      val id = i.toLong
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (h, id, v)
    }.toArray
  }

  // ---- independent reference (collections-style, mirrors the SQL
  // oracle loop rather than the kernel's imperative style) ----

  private def refD2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def refRound(x: Double): Long =
    BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble.toLong

  private def refSeeds(rows: Array[(String, Long, Array[Long])],
      k: Int): Vector[Array[Long]] = {
    var chosen = Vector(rows.minBy(t => (t._1, t._2)))
    while (chosen.size < k) {
      // max min-distance to the chosen set, smallest id on ties
      val next = rows
        .map(r => (r, chosen.map(c => refD2(r._3, c._3)).min))
        .minBy { case (r, d) => (-d, r._2) }._1
      chosen = chosen :+ next
    }
    chosen.map(_._3)
  }

  private def refLloyd(vecs: Array[Array[Long]],
      cents: Vector[(Int, Array[Long])]): Vector[(Int, Array[Long])] = {
    val assigned = vecs.map { v =>
      val (ccid, _) = cents.map { case (id, c) => (id, refD2(v, c)) }
        .minBy { case (id, d) => (d, id) }
      (ccid, v)
    }
    assigned.groupBy(_._1).toVector.sortBy(_._1).map { case (id, group) =>
      val vs = group.map(_._2)
      val dim = vs(0).length
      id -> Array.tabulate(dim) { p =>
        refRound(vs.map(_(p)).sum.toDouble / vs.length.toDouble)
      }
    }
  }

  test("roundToLong is Spark's round().cast('long'): HALF_UP away from zero") {
    assert(TrainKernels.roundToLong(2.5) == 3L)
    assert(TrainKernels.roundToLong(-2.5) == -3L)
    assert(TrainKernels.roundToLong(0.49999999999999994) == 0L)
    assert(TrainKernels.roundToLong(-0.5) == -1L)
    assert(TrainKernels.roundToLong(7.0) == 7L)
    // the value math.round gets wrong for negatives (rounds to -1):
    assert(TrainKernels.roundToLong(-1.5) == -2L)
  }

  test("pqBook == independent reference on tie-heavy data (incl. empty-cluster rounds)") {
    // spread 3 over dim 4 makes distance ties and cluster collapses
    // common; KS=4 on 40 rows forces tight clusters
    val rows = mkRows(40, 8, seed = 42L, spread = 3L)
    val (m, d, ks, iters) = (2, 4, 4, 3)
    val fused = TrainKernels.pqBook(rows, m, d, ks, iters)
    val ref = (0 until m).flatMap { sp =>
      val sub = rows.map { case (h, id, v) =>
        (h, id, v.slice(sp * d, (sp + 1) * d)) }
      var cents = refSeeds(sub, ks).zipWithIndex
        .map { case (c, i) => (i + 1, c) }.toVector
      (1 to iters).foreach(_ => cents = refLloyd(sub.map(_._3), cents))
      cents.map { case (ccid, c) => (sp, ccid, c) }
    }
    assert(fused.map(t => (t._1, t._2, t._3.toSeq)) ==
      ref.map(t => (t._1, t._2, t._3.toSeq)))
  }

  test("pqBook on well-spread data keeps all KS codewords") {
    val rows = mkRows(200, 16, seed = 7L, spread = 1000L)
    val book = TrainKernels.pqBook(rows, M = 2, D = 8, KS = 8, iters = 2)
    assert(book.map(t => (t._1, t._2)).toSet ==
      (for (sp <- 0 until 2; c <- 1 to 8) yield (sp, c)).toSet)
  }

  test("sphericalKmeans == independent reference (renormalized recenters)") {
    val rows = mkRows(60, 8, seed = 11L, spread = 500L)
    val fused = TrainKernels.sphericalKmeans(rows, k = 5, iters = 3)
    var ref = refSeeds(rows, 5).zipWithIndex.map { case (c, i) => (i + 1, c) }
    (1 to 3).foreach { _ =>
      ref = refLloyd(rows.map(_._3), ref.toVector).map { case (id, cv0) =>
        val csq = cv0.map(x => x * x).sum
        id -> cv0.map(x => refRound(x.toDouble / math.sqrt(csq.toDouble) * 1e6))
      }
    }
    assert(fused.map(t => (t._1, t._2.toSeq)) == ref.map(t => (t._1, t._2.toSeq)))
  }

  test("farthest-first tie-break: equal min-distances pick the smallest id") {
    // three identical vectors → after the first pick every distance is
    // 0 and the tie must resolve to the smallest remaining vec_id
    val v = Array(1L, 2L)
    val rows = Array(("bb", 5L, v), ("aa", 9L, v), ("cc", 3L, v))
    val seeds = TrainKernels.farthestFirst(rows, 3)
    assert(seeds.length == 3) // picks 9 ("aa" min hash) then ids 3, 5
    // verify via pqBook path that ccids stay 1..3 even with ties
    val book = TrainKernels.pqBook(rows.map { case (h, id, x) => (h, id, x) },
      M = 1, D = 2, KS = 3, iters = 1)
    // all rows identical → every vector assigns to ccid 1; clusters
    // 2 and 3 empty out and drop, exactly as the groupBy would
    assert(book.map(_._2) == Seq(1))
  }
}
