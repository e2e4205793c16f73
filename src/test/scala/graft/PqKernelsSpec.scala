package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r20 native PQ kernels (PqEncode / PqAdcTable / PqAdcScore) and
  * IntSqDist replaced interpreted higher-order-function chains on the
  * q123/q160 hot path. This spec pins each native expression against
  * the exact Column-API formulation it replaced, evaluated on the
  * same DataFrame — any semantic drift (argmin tie-break, 1-based ADC
  * indexing, flattened-book layout, null propagation) diverges the
  * two columns.
  */
class PqKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.graftshim.ColumnShim

  private val M = 2; private val D = 4; private val KS = 3

  // deterministic fixture: 40 vectors of M*D longs, small value range
  // so distance TIES are common (the tie-break is the risky part)
  private def vecs: Seq[(Long, Seq[Long])] = {
    var x = 12345L
    def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; math.floorMod(x, 5L) }
    (0L until 40L).map(i => i -> Seq.fill(M * D)(nxt()))
  }

  // a book with duplicate centroids inside a subspace (forces ties)
  private val book: Array[Long] = Array(
    // sub 0: ccid 1..3 (ccid 2 == ccid 3 → ties must pick 2)
    0, 1, 2, 3,  4, 4, 4, 4,  4, 4, 4, 4,
    // sub 1
    1, 1, 1, 1,  0, 0, 0, 0,  3, 2, 1, 0)

  private def bookLit = {
    // the replaced formulation's literal: array<struct<sub,ccid,cvec>>
    array((for (sp <- 0 until M; c <- 1 to KS) yield
      struct(lit(sp).as("sub"), lit(c).as("ccid"),
        array((0 until D).map(p => lit(book((sp * KS + c - 1) * D + p))): _*).as("cvec"))): _*)
  }

  private def hofSqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  test("PqEncode == the array_min(struct(d2, ccid)) HOF formulation (tie-heavy)") {
    val df = vecs.toDF("id", "v").withColumn("v", $"v".cast("array<long>"))
    val hof = transform(sequence(lit(0), lit(M - 1)), sp =>
      array_min(transform(filter(bookLit, e => e("sub") === sp), e =>
        struct(hofSqDist(slice($"v", sp * D + lit(1), lit(D)), e("cvec")).as("d2"),
          e("ccid").as("ccid"))))("ccid"))
    val native = ColumnShim.column(
      graft.plans.PqEncode(ColumnShim.expression($"v"), book, M, D, KS))
    val bad = df.select($"id", hof.as("a"), native.as("b"))
      .filter(not($"a" === $"b")).count()
    assert(bad == 0)
  }

  test("PqAdcTable == the transform(bookLit, sqDist(slice)) formulation") {
    val df = vecs.toDF("id", "v").withColumn("v", $"v".cast("array<long>"))
    val hof = transform(bookLit, e =>
      hofSqDist(slice($"v", e("sub") * D + lit(1), lit(D)), e("cvec")))
    val native = ColumnShim.column(
      graft.plans.PqAdcTable(ColumnShim.expression($"v"), book, M, D, KS))
    val bad = df.select($"id", hof.as("a"), native.as("b"))
      .filter(not($"a" === $"b")).count()
    assert(bad == 0)
  }

  test("PqAdcScore == the aggregate(element_at) fold, 1-based indexing") {
    val df = vecs.toDF("id", "v").withColumn("v", $"v".cast("array<long>"))
    val dt = ColumnShim.column(
      graft.plans.PqAdcTable(ColumnShim.expression($"v"), book, M, D, KS))
    val code = ColumnShim.column(
      graft.plans.PqEncode(ColumnShim.expression($"v"), book, M, D, KS))
    val withCols = df.select($"id", dt.as("dt"), code.as("code"))
    val hof = aggregate(sequence(lit(0), lit(M - 1)), lit(0L), (acc, sp) =>
      acc + element_at($"dt", sp * KS + element_at($"code", sp + 1)))
    val native = ColumnShim.column(graft.plans.PqAdcScore(
      ColumnShim.expression($"dt"), ColumnShim.expression($"code"), KS))
    val bad = withCols.select(hof.as("a"), native.as("b"))
      .filter(not($"a" === $"b")).count()
    assert(bad == 0)
  }

  test("IntSqDist == aggregate(zip_with) incl. null propagation") {
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](3L, 1L, 2L)),
      (2L, Seq[java.lang.Long](-5L, 0L, 7L), Seq[java.lang.Long](5L, -1L, 7L)),
      (3L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 2L, 3L)))
      .toDF("id", "a", "b")
    val native = ColumnShim.column(graft.plans.IntSqDist(
      ColumnShim.expression($"a"), ColumnShim.expression($"b")))
    val rows = df.select($"id", hofSqDist($"a", $"b").as("x"), native.as("y"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), if (r.isNullAt(1)) 0L else r.getLong(1),
        r.isNullAt(2), if (r.isNullAt(2)) 0L else r.getLong(2)))
    rows.foreach { case (id, an, av, bn, bv) =>
      assert(an == bn && (an || av == bv), s"row $id: hof=($an,$av) native=($bn,$bv)")
    }
    // length mismatch → null (the zip_with shape would throw/diverge;
    // the kernel contract is null, matching intDot)
    val mm = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(native.as("y")).collect()(0)
    assert(mm.isNullAt(0))
  }
}
