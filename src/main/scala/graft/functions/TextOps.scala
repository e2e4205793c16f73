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

  /** Distinct k-word shingles of a token array (guarded for short
    * docs). Native codegen kernel ([[graft.plans.Shingles]]) — the
    * former `array_distinct(transform(...))` HOF chain ran
    * interpreted on every dedup-family corpus scan (rule §4).
    */
  def shingles(w: Column, k: Int = 3): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.plans.Shingles(ColumnShim.expression(w), k))
  }

  /** Word bigrams ("w[i] w[i+1]") in one codegen pass
    * ([[graft.plans.Bigrams]]) — the former
    * `zip_with(slice(w, 1, n−1), slice(w, 2, n−1), concat)` chain ran
    * interpreted on every bigram-family corpus scan (rule §4).
    */
  def bigrams(w: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.plans.Bigrams(ColumnShim.expression(w)))
  }

  /** `n` seeded MinHash values (seeds `seedFrom until seedFrom + n`)
    * in ONE fused pass over the shingles
    * ([[graft.plans.MinHashes]]); empty shingle sets yield n nulls,
    * exactly as the per-seed `array_min(transform(...))` did.
    */
  def minhashes(sh: Column, seedFrom: Int, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.plans.MinHashes(ColumnShim.expression(sh), seedFrom, n))
  }

  /** One MinHash value: min over the shingle set of seeded md5. */
  def minhash(sh: Column, seed: Int): Column =
    element_at(minhashes(sh, seed, 1), 1)

  /** LSH band key: concatenation of `rowsPerBand` consecutive
    * minhashes (one fused kernel pass). Docs sharing any band key are
    * near-dup candidates. Empty shingle sets give '' (concat_ws skips
    * the null minhashes), as before.
    */
  def bandKey(sh: Column, band: Int, rowsPerBand: Int): Column =
    concat_ws("|", minhashes(sh, band * rowsPerBand, rowsPerBand))

  /** Per-target occurrence counts over a token array in one codegen
    * pass ([[graft.plans.TermCounts]]) — the retrieval-family posting
    * build for a bounded collected query-term set.
    */
  def termCounts(w: Column, targets: Array[String]): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.plans.TermCounts(ColumnShim.expression(w), targets))
  }

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
