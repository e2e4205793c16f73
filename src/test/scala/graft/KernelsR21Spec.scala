package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r21 native kernels replaced the remaining interpreted
  * higher-order-function chains on corpus-linear scans (rule §4 of
  * the optimization playbook). This spec pins each native expression
  * against the EXACT Column-API formulation it replaced, evaluated on
  * the same DataFrame — any semantic drift (null propagation, length
  * mismatch, rounding, tie-breaks, boundary positions) diverges the
  * two columns.
  */
/** typedLit row shape for the IvfNearestIdx equivalence fixture. */
final case class TestCentRow(cid: Int, cvec: Seq[Long])

class KernelsR21Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.graftshim.ColumnShim

  private def col2(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    ColumnShim.column(e)

  test("LongVecSub == zip_with minus (nulls, unequal lengths)") {
    val rows = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](3L, 1L, -4L)),
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 1L, 1L)),
      (Seq[java.lang.Long](5L), Seq[java.lang.Long](1L, 2L)),       // left shorter
      (Seq[java.lang.Long](5L, 6L, 7L), Seq[java.lang.Long](1L)),   // right shorter
      (Seq.empty[java.lang.Long], Seq[java.lang.Long](1L)),
      // quantized-range magnitudes (the kernel's input contract: the
      // ANSI overflow branch of the HOF is unreachable for |v| ≤ ~2^31)
      (Seq[java.lang.Long](2000000000L, -2000000000L),
        Seq[java.lang.Long](-2000000000L, 2000000000L))
    )
    val df = rows.toDF("a", "b")
    val hof = zip_with($"a", $"b", (x, y) => x - y)
    val native = col2(graft.plans.LongVecSub(
      ColumnShim.expression($"a"), ColumnShim.expression($"b")))
    val bad = df.select(hof.as("h"), native.as("n"))
      .filter(not($"h" <=> $"n")).count()
    assert(bad == 0)
  }

  private val M = 2; private val D = 4; private val KS = 3
  private val book: Array[Long] = Array(
    0, 1, 2, 3, 4, 4, 4, 4, 4, 4, 4, 4,
    1, 1, 1, 1, 0, 0, 0, 0, 3, 2, 1, 0)

  private def pqVecs: Seq[(Seq[Long], Seq[Long])] = {
    var x = 98765L
    def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; math.floorMod(x, 7L) }
    (0 until 40).map(_ => (Seq.fill(M * D)(nxt()), Seq.fill(M * D)(nxt())))
  }

  test("PqEncodeResid == PqEncode over the staged zip_with residual") {
    val df = pqVecs.toDF("q", "c")
    val resid = zip_with($"q", $"c", (x, y) => x - y)
    val staged = col2(graft.plans.PqEncode(
      ColumnShim.expression(resid), book, M, D, KS))
    val fused = col2(graft.plans.PqEncodeResid(
      ColumnShim.expression($"q"), ColumnShim.expression($"c"), book, M, D, KS))
    val bad = df.select(staged.as("a"), fused.as("b"))
      .filter(not($"a" === $"b")).count()
    assert(bad == 0)
  }

  test("PqAdcTableResid == PqAdcTable over the staged zip_with residual") {
    val df = pqVecs.toDF("q", "c")
    val resid = zip_with($"q", $"c", (x, y) => x - y)
    val staged = col2(graft.plans.PqAdcTable(
      ColumnShim.expression(resid), book, M, D, KS))
    val fused = col2(graft.plans.PqAdcTableResid(
      ColumnShim.expression($"q"), ColumnShim.expression($"c"), book, M, D, KS))
    val bad = df.select(staged.as("a"), fused.as("b"))
      .filter(not($"a" === $"b")).count()
    assert(bad == 0)
  }

  test("Bigrams == zip_with(slice, slice, concat) incl. 1-word and empty-string docs") {
    val docs = Seq("a b c d", "a", "", "x y", "a  b", "solo word pair here now")
    val df = docs.toDF("text")
    val w = split($"text", " ")
    val hof = zip_with(
      slice(w, lit(1), size(w) - 1),
      slice(w, lit(2), size(w) - 1),
      (a, b) => concat(a, lit(" "), b))
    val native = col2(graft.plans.Bigrams(ColumnShim.expression(w)))
    val bad = df.select(hof.as("h"), native.as("n"))
      .filter(not($"h" <=> $"n")).count()
    assert(bad == 0)
  }

  test("GramsWithPos == the guarded transform(sequence, struct(pos, array_join(slice)))") {
    val k = 4
    val docs = Seq("a b c d e f", "a b c d", "a b c", "", "one",
      "w w w w w w w w w w")
    val df = docs.toDF("text")
    val w = split($"text", " ")
    val n = size(w)
    val positions = when(n >= k, sequence(lit(1), n - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val hof = transform(positions, i =>
      struct(i.as("pos"), array_join(slice(w, i, lit(k)), " ").as("gram")))
    val native = col2(graft.plans.GramsWithPos(ColumnShim.expression(w), k))
    val bad = df.select(hof.as("h"), native.as("n"))
      .filter(not($"h" <=> $"n")).count()
    assert(bad == 0)
  }

  test("EqCount == size(filter(zip_with(a, b, _ = _), x => x)) incl. nulls/unequal lengths") {
    val rows = Seq(
      (Seq[String]("a", "b", "c"), Seq[String]("a", "x", "c")),
      (Seq[String]("a", null, "c"), Seq[String]("a", null, "c")),
      (Seq[String]("a", "b"), Seq[String]("a", "b", "c")),
      (Seq.empty[String], Seq[String]("a")),
      (Seq[String]("q", "q", "q"), Seq[String]("q", "q", "q")))
    val df = rows.toDF("a", "b")
    val hof = expr("size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))")
    val native = col2(graft.plans.EqCount(
      ColumnShim.expression($"a"), ColumnShim.expression($"b")))
    val bad = df.select(hof.as("h"), native.as("n"))
      .filter(not($"h" <=> $"n")).count()
    assert(bad == 0)
  }

  test("RenormQuantize == transform(round(cast / sqrt(nsq) * 1e6).cast(long))") {
    val rows = Seq(
      Seq(1L, 2L, 3L, -4L),
      Seq(1000000L, -999999L, 0L, 7L),
      Seq(123456789L, 5L, -5L, 500000L))
    val df = rows.toDF("q0")
    val nsq = aggregate(zip_with($"q0", $"q0", (x, y) => x * y), lit(0L), (a, v) => a + v)
    val dfn = df.withColumn("nsq0", nsq)
    val hof = transform($"q0", x =>
      round(x.cast("double") / sqrt($"nsq0".cast("double")) * lit(1e6)).cast("long"))
    val native = col2(graft.plans.RenormQuantize(
      ColumnShim.expression($"q0"), ColumnShim.expression($"nsq0")))
    val bad = dfn.select(hof.as("h"), native.as("n"))
      .filter(not($"h" <=> $"n")).count()
    assert(bad == 0)
  }

  test("WordChunks == transform(sequence(0, ceil(n/16)-1), array_join(slice)) on split output") {
    val docs = Seq("", "a", ("w " * 15).trim, ("w " * 16).trim, ("w " * 17).trim,
      (1 to 100).map("t" + _).mkString(" "))
    val df = docs.toDF("text")
    val w = split($"text", " ")
    val hof = transform(
      sequence(lit(0L), expr("CAST((size(split(text, ' ')) + 15) DIV 16 - 1 AS BIGINT)")),
      i => array_join(slice(w, (i * 16 + 1).cast("int"), lit(16)), " "))
    val native = col2(graft.plans.WordChunks(ColumnShim.expression(w), 16))
    val bad = df.select(hof.as("h"), native.as("n"))
      .filter(not($"h" <=> $"n")).count()
    assert(bad == 0)
  }

  test("IvfNearestIdx == array_min(transform(centLit, struct(d2, id))) argmin (tie-heavy)") {
    val dim = 4
    // duplicate centroids force distance ties; the winner must be the
    // EARLIEST (smallest id) cell both ways
    val cents: Seq[Seq[Long]] = Seq(
      Seq(0L, 1L, 2L, 3L), Seq(4L, 4L, 4L, 4L), Seq(4L, 4L, 4L, 4L),
      Seq(1L, 1L, 1L, 1L), Seq(0L, 1L, 2L, 3L))
    var x = 4242L
    def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; math.floorMod(x, 5L) }
    val df = (0 until 60).map(_ => Seq.fill(dim)(nxt())).toDF("q")
    val centLit = typedLit(cents.zipWithIndex.map { case (c, i) => (i + 1, c) }
      .map { case (id, c) => TestCentRow(id, c) })
    val hofSqDist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (p, q) => (p - q) * (p - q)), lit(0L), (acc, v) => acc + v)
    val hof = array_min(transform(centLit, e =>
      struct(hofSqDist($"q", e("cvec")).as("d2"), e("cid").as("cid"))))("cid")
    val native = col2(graft.plans.IvfNearestIdx(
      ColumnShim.expression($"q"), cents.flatten.toArray, dim))
    val bad = df.select(hof.as("h"), native.as("n"))
      .filter(not($"h" <=> $"n")).count()
    assert(bad == 0)
  }

  test("TermCounts == per-target size(filter(w, _ === t)) incl. dup targets and empty docs") {
    val targets = Array("the", "a", "the") // duplicate target must count independently
    val docs = Seq("the a the b", "", "a", "b c d", "the the the a a")
    val df = docs.toDF("text")
    val w = split($"text", " ")
    val hof = array(targets.map(t => size(filter(w, x => x === lit(t)))): _*)
    val native = col2(graft.plans.TermCounts(ColumnShim.expression(w), targets))
    val bad = df.select(hof.as("h"), native.as("n"))
      .filter(not($"h" <=> $"n")).count()
    assert(bad == 0)
  }

  test("quantize(float) == quantize(transform(cast double)) — the q34/q83 union hoist") {
    val rows = Seq(
      Seq(0.1f, -0.25f, 1.5e-3f, 0.9999999f),
      Seq(Float.MinPositiveValue, 123.456f, -7.89f, 0f))
    val df = rows.toDF("embedding")
    val asDouble = transform($"embedding", x => x.cast("double"))
    val a = graft.functions.VectorOps.quantize($"embedding")
    val b = graft.functions.VectorOps.quantize(asDouble)
    val bad = df.select(a.as("a"), b.as("b")).filter(not($"a" <=> $"b")).count()
    assert(bad == 0)
  }
}
