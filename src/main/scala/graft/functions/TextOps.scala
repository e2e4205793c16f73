package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, shingle
  * and MinHash construction. All pure column expressions — codegen'd,
  * no UDFs — so they run inside whole-stage codegen at any scale.
  *
  * Hash primitive is md5-hex (portable across engines and stable
  * across JVMs); MinHash uses lexicographic min over seeded md5
  * strings, which is an order-preserving uniform hash family.
  */
object TextOps {

  /** Whitespace tokenization (single-space convention of the corpus). */
  def words(text: Column): Column = split(text, " ")

  /** Distinct k-word shingles of a token array (guarded for short docs). */
  def shingles(w: Column, k: Int = 3): Column =
    when(size(w) < k, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(w) - (k - 1)),
        i => concat_ws(" ", slice(w, i, lit(k))))))

  /** One MinHash value: min over the shingle set of seeded md5. */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, x => md5(concat(lit(s"$seed:"), x))))

  /** LSH band key: concatenation of `rowsPerBand` consecutive
    * minhashes. Docs sharing any band key are near-dup candidates.
    */
  def bandKey(sh: Column, band: Int, rowsPerBand: Int): Column =
    concat_ws("|", (0 until rowsPerBand)
      .map(r => minhash(sh, band * rowsPerBand + r)): _*)

  /** Count of tokens drawn from a marker vocabulary. */
  def markerCount(w: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(w, x => array_contains(m, x)))
  }

  /** Content fingerprint — md5 of the raw text (exact-dup key). */
  def fingerprint(text: Column): Column = md5(text)

  /** Jaccard similarity of two distinct-element arrays, as double. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
