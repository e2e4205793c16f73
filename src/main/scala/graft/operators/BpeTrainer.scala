package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.BpeMerges

/** Distributed BPE tokenizer TRAINING (Sennrich 2016 §3 `learn_bpe`;
  * reference semantics: the tokenizer-artifact production step a
  * crawl pipeline runs before any [[graft.plans.BpeEncode]] apply).
  * Closes the q164 gap: the engine could apply a merge table nothing
  * in it could produce.
  *
  * Scale shape — the 100 TB contract:
  *
  *  - The ONLY corpus-scale operation is the first aggregation: split
  *    the corpus into words and count word frequencies (one keyed
  *    shuffle with map-side partial combine, exactly the q24 class).
  *    Everything after runs on the VOCABULARY frame — distinct words
  *    with their corpus weights — which is sub-linear in the corpus
  *    (Heaps' law) and bounded like the q97/q160 training samples.
  *  - Each merge round is (a) one vocab-sized pair-count aggregation
  *    (adjacent token pairs weighted by word frequency — the standard
  *    overlapping count: a word `aaa` contributes (a,a) twice), (b) a
  *    single-row argmax collected to the driver (the merge TABLE is a
  *    bounded driver-side artifact by design — the PQ-codebook
  *    discipline), and (c) one map-only codegen re-tokenization pass
  *    ([[graft.plans.BpeMergePair]]).
  *  - The vocabulary frame lives under [[Checkpoints.stable]]: the
  *    loop's lineage stays flat (round k must not re-run rounds
  *    1..k-1's projections from the corpus), training survives
  *    executor loss on a remote-executor master (the r18 chaos-probe
  *    class), and each superseded round's blocks are freed eagerly
  *    ([[Checkpoints.free]], the [[Components]] loop discipline).
  *
  * Determinism: argmax ties break by the pair's byte order (`count
  * DESC, "left right" ASC`) — for space-free tokens the concatenated
  * key orders exactly like the (left, right) tuple, and Spark's
  * UTF8String and DuckDB's VARCHAR compare bytes identically, so the
  * oracle can replay the selection. One merge pass per round is
  * exhaustive for its pair (see [[BpeMerges.mergePair]]), so
  * re-counting immediately after the pass is sound.
  *
  * Round-trip contract (CrawlSpec): feeding the learned table to
  * [[graft.plans.BpeEncode]] reproduces the training tokenization of
  * every vocabulary word — apply's lowest-rank-first loop replays the
  * training order because each pair's rank records exactly when it
  * became the best merge.
  */
object BpeTrainer {

  /** Learned merges in rank order plus the FINAL tokenized vocabulary
    * frame (`word`, `freq`, `toks`) — the round-trip witness. The
    * vocab is a live checkpointed frame; inside a [[Staging.scoped]]
    * block its blocks are freed at scope exit, otherwise the caller
    * owns them (the [[Components]] terminal-frame contract).
    */
  final case class Learned(merges: Seq[(String, String, Long)], vocab: DataFrame)

  /** Adjacent-pair keys of a token array: `toks[i] + " " + toks[i+1]`
    * for every position (overlapping, the standard BPE count).
    */
  private def adjacentPairs(toks: Column): Column =
    when(size(toks) > 1,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  def learn(docs: DataFrame, textCol: String, nMerges: Int,
      byteLevel: Boolean = false): Learned = {
    require(nMerges > 0 && nMerges <= 65536,
      s"nMerges must be a bounded artifact size, got $nMerges")
    val s = docs.sparkSession
    import s.implicits._

    // The one corpus-scale pass: word frequencies. Char-level seeds
    // per CODE POINT (split("") — matching BpeEncode's code-point
    // apply seeding); byte-level seeds per UTF-8 byte through the
    // GPT-2 table ([[graft.plans.GptByteTokens]] — matching
    // BpeEncode's byte mode). The merge loop is alphabet-agnostic
    // above the seed.
    val words = docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    val seed =
      if (byteLevel) {
        import org.apache.spark.sql.graftshim.ColumnShim
        ColumnShim.column(graft.plans.GptByteTokens(ColumnShim.expression($"word")))
      } else split($"word", "")
    var vocab = Checkpoints.stable(
      words.select($"word", $"freq", seed.as("toks")))

    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    val seen = scala.collection.mutable.HashSet.empty[(String, String)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val best = vocab
        .select($"freq", explode(adjacentPairs($"toks")).as("pair"))
        .groupBy($"pair").agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"pair".asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word is one token
      else {
        val Array(a, b) = best(0).getString(0).split(" ", 2)
        val cnt = best(0).getLong(1)
        // A re-selected pair would mean a later merge recreated an
        // already-exhausted pair's occurrences AND they out-counted
        // everything else — a malformed table downstream (BpeEncode
        // rejects duplicate ranks). Fail loudly, never emit it.
        require(seen.add((a, b)),
          s"BPE training re-selected pair '$a $b' at rank ${k + 1} — " +
            "the corpus recreates exhausted pairs faster than it consumes them")
        merges += ((a, b, cnt))
        val next = Checkpoints.stable(
          vocab.select($"word", $"freq",
            BpeMerges.mergePair($"toks", a, b).as("toks")))
        Checkpoints.free(vocab) // superseded round's blocks are dead
        vocab = next
        k += 1
      }
    }
    val terminal = vocab
    Staging.onScopeExit(() => Checkpoints.free(terminal))
    Learned(merges.toList, vocab)
  }

  /** The merge table as a frame: `(rk, lhs, rhs, pair_count)` in rank
    * order, rank 1-based — the q165 presentation (and the artifact a
    * deployment would write next to its corpus snapshot).
    */
  def learnTable(docs: DataFrame, textCol: String, nMerges: Int,
      byteLevel: Boolean = false): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val learned = learn(docs, textCol, nMerges, byteLevel)
    Checkpoints.free(learned.vocab) // table-only callers never read it
    learned.merges.zipWithIndex
      .map { case ((a, b, cnt), i) => (i + 1L, a, b, cnt) }
      .toDF("rk", "lhs", "rhs", "pair_count")
      .orderBy($"rk")
  }
}
