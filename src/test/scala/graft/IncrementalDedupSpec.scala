package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Batch-vs-corpus incremental dedup (q124) semantics on planted
  * fixtures: each drop reason fires on its intended construction, the
  * corpus reasons outrank the batch reasons, and within-batch dedup
  * keeps the smallest id. The driver's DuckDB gate covers value parity
  * on the real corpus.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpusText =
    "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm stove all day"
  private val batchOnlyText =
    "completely different content about distributed query engines and their shuffle behavior under load today"
  private val novelText =
    "unrelated musings on typography kerning ligatures and the shapes of letterforms in print"

  private def verdicts(
      inc: Seq[(Long, String)], ex: Seq[(Long, String)]): Map[Long, String] =
    TextQueries.incrementalDedupCore(
        inc.toDF("doc_id", "text"), ex.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("each drop reason fires; novel passes through") {
    val nearCorpusText = corpusText.replace("stove", "hearth")
    val nearBatchText = batchOnlyText.replace("load", "stress")
    val out = verdicts(
      inc = Seq(
        10L -> corpusText,       // exact copy of corpus doc
        15L -> nearCorpusText,   // one word changed vs corpus doc
        20L -> batchOnlyText,    // first occurrence in batch -> novel
        25L -> batchOnlyText,    // exact copy of smaller batch id
        30L -> nearBatchText,    // near copy of smaller batch id
        40L -> novelText),       // nothing like it anywhere
      ex = Seq(1L -> corpusText, 2L -> "some other existing corpus document text here"))
    assert(out == Map(
      10L -> "exact_corpus",
      15L -> "near_corpus",
      20L -> "novel",
      25L -> "exact_batch",
      30L -> "near_batch",
      40L -> "novel"), out.toString)
  }

  test("corpus match outranks batch match; existing docs never appear in output") {
    // doc 25 is an exact copy of BOTH the corpus doc and batch doc 10:
    // the corpus reason (r=1) must win over exact_batch (r=3)
    val out = verdicts(
      inc = Seq(10L -> corpusText, 25L -> corpusText),
      ex = Seq(1L -> corpusText))
    assert(out(10L) == "exact_corpus")
    assert(out(25L) == "exact_corpus")
    assert(out.keySet == Set(10L, 25L), "existing ids leaked into the output")
  }

  test("empty corpus: batch still dedups against itself") {
    val out = verdicts(
      inc = Seq(5L -> batchOnlyText, 10L -> batchOnlyText, 15L -> novelText),
      ex = Seq.empty)
    assert(out == Map(5L -> "novel", 10L -> "exact_batch", 15L -> "novel"))
  }

  test("q124 full-table query: verdict only for the incoming 20%") {
    val rows = TextQueries.incrementalDedup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 5 == 0), "non-batch doc in output")
    val allowed = Set("exact_corpus", "near_corpus", "exact_batch", "near_batch", "novel")
    assert(rows.forall(r => allowed(r.getString(1))))
  }
}
