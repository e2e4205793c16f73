package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector similarity operators (ANN / IVF / LSH family).
  *
  * Embeddings are quantized to int64 at 1e-6 resolution on load; all
  * dot products and norms are then EXACT integer arithmetic, so
  * similarity scores are bit-identical on any partitioning / engine
  * (IEEE sqrt and division are correctly rounded). This mirrors
  * production ANN practice (int8/PQ quantization) and is why the whole
  * family is oracle-checkable.
  *
  * All operators are higher-order column expressions — no UDFs, no
  * per-row JVM closures; they stay inside codegen and scale linearly.
  */
object VectorOps {

  /** float[] → int64[] at 1e6 scale (exact arithmetic thereafter).
    * Native codegen kernel ([[graft.plans.QuantizeVec]]): the
    * `transform(round(cast · scale))` HOF it replaces was a
    * CodegenFallback evaluated interpreted on every similarity-family
    * corpus scan (rule §4; same semantics to the last ulp — widen,
    * double multiply, HALF_UP round, truncating cast).
    */
  def quantize(v: Column, scale: Double = 1e6): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.plans.QuantizeVec(ColumnShim.expression(v), scale))
  }

  /** Exact int64 dot product of two quantized vectors — the native
    * codegen [[graft.plans.IntDotProduct]] (one fused multiply-add
    * loop per row; the `aggregate(zip_with(...))` formulation was a
    * CodegenFallback materializing an intermediate array per pair).
    */
  def intDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.plans.IntDotProduct(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  }

  /** Exact squared L2 norm of a quantized vector. */
  def intNormSq(v: Column): Column = intDot(v, v)

  /** Cosine similarity from exact integer dot/norms (deterministic:
    * sqrt and division are correctly rounded IEEE ops).
    */
  def cosine(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") /
      (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  /** Random-hyperplane LSH signature over a quantized vector.
    *
    * Hyperplane `p`'s coefficient for dimension `i` is ±1 derived from
    * md5(p:i) — a deterministic, engine-portable pseudo-random plane.
    * Bit = (Σ ±x_i >= 0). Returns the signature as a bit-string key;
    * vectors sharing the key are ANN candidates (bucketed search).
    */
  def rhpSignature(q: Column, nPlanes: Int): Column =
    rhpSignature(q, nPlanes, 0)

  /** As above, using the plane indices `[offset, offset + nPlanes)` —
    * the band primitive for OR-construction LSH: band b of width w is
    * `rhpSignature(q, w, b * w)`, giving each band an independent set
    * of hyperplanes while staying deterministic and engine-portable.
    *
    * The ±1 coefficient of plane `p`, dimension `i` is DEFINED as
    * "first hex digit of md5("p:i") in 0-7" — but it depends only on
    * (p, i), so the sign vectors are evaluated ONCE here (driver-side
    * md5) and embedded as literal arrays: the scan does one
    * multiply-add per (plane, dim) instead of an md5 per (row, plane,
    * dim), while the DuckDB oracle recomputing md5 per row gets
    * bit-identical signatures.
    */
  def rhpSignature(q: Column, nPlanes: Int, offset: Int): Column =
    rhpSignature(q, nPlanes, offset, 64)

  /** As above for a `dim`-dimensional vector (the embeddings fixture
    * is 64-wide; engine-produced [[graft.plans.HashedBagEmbed]]
    * vectors are k-wide — q174 bands those at dim = 16).
    */
  def rhpSignature(q: Column, nPlanes: Int, offset: Int, dim: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    val md = java.security.MessageDigest.getInstance("MD5")
    val signs = new Array[Long](nPlanes * dim)
    var j = 0
    for (p <- offset until offset + nPlanes; i <- 0 until dim) {
      val h = md.digest(s"$p:$i".getBytes("UTF-8"))
      // first hex char < '8'  ⇔  top nibble of byte 0 is 0-7
      signs(j) = if ((h(0) & 0x80) == 0) 1L else -1L
      j += 1
    }
    // One native codegen call emits the whole bit-string
    // (graft.plans.RhpSignature) instead of an interpreted
    // aggregate(zip_with) + when chain per plane.
    ColumnShim.column(graft.plans.RhpSignature(ColumnShim.expression(q), signs, dim))
  }
}
