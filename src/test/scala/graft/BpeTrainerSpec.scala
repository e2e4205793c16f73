package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer
import graft.plans.BpeMerges

/** Locks for the r20 vocab-scale restructure of [[BpeTrainer]]: the
  * batched merge loop must produce EXACTLY the merge list sequential
  * per-merge argmax produces — same pairs, same order, same counts —
  * because the q165/q168/q169 DuckDB oracles replay sequential greedy
  * step by step. The dangerous cases are all coincidence-shaped
  * (pairs sharing tokens, mints colliding with live tokens, mints
  * colliding with each other), so beyond the fixture corpora this
  * spec grinds randomized tiny-alphabet corpora where those
  * collisions are the NORM rather than the exception.
  */
class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sequential(docs: org.apache.spark.sql.DataFrame, n: Int,
      byteLevel: Boolean = false) =
    BpeTrainer.learn(docs, "text", n, byteLevel, maxBatch = 1).merges

  private def batched(docs: org.apache.spark.sql.DataFrame, n: Int,
      byteLevel: Boolean = false, maxBatch: Int = 16) =
    BpeTrainer.learn(docs, "text", n, byteLevel, maxBatch = maxBatch).merges

  // ---- selectBatch unit surface ----

  private def sb(top: Seq[(String, String, Long)], maxKeep: Int,
      truncated: Boolean, alive: Set[String]) =
    BpeTrainer.selectBatch(top, maxKeep, truncated, alive)

  test("selectBatch keeps a token-disjoint prefix and stops at the first interaction") {
    val top = Seq(("a", "b", 100L), ("c", "d", 90L), ("b", "e", 80L), ("f", "g", 70L))
    // (b,e) shares b with the first keep → stop; (f,g) never examined
    // as a keep, and both keeps clear the 80 bound strictly
    assert(sb(top, 16, truncated = false, Set.empty)
      == Seq(("a", "b", 100L), ("c", "d", 90L)))
  }

  test("selectBatch drops keeps that only TIE the stop bound (created pairs can tie)") {
    val top = Seq(("a", "b", 100L), ("c", "d", 90L), ("b", "e", 90L))
    // (c,d) ties the interacting (b,e): a pair created by the (a,b)
    // merge could reach 90 too and win the byte-order tie → only the
    // head survives
    assert(sb(top, 16, truncated = false, Set.empty) == Seq(("a", "b", 100L)))
  }

  test("selectBatch treats a mint collision with a LIVE token as head-only") {
    val top = Seq(("a", "b", 100L), ("c", "d", 99L))
    // 'ab' is already a live token: pairs containing it can GAIN
    // occurrences past any collected count — nothing after the head
    // is bounded
    assert(sb(top, 16, truncated = false, Set("ab")) == Seq(("a", "b", 100L)))
    // ...but a live-token collision on a LATER candidate just stops
    // the walk there (the earlier keeps stay exact)
    val top2 = Seq(("a", "b", 100L), ("c", "d", 90L), ("e", "f", 80L))
    assert(sb(top2, 16, truncated = false, Set("ef"))
      == Seq(("a", "b", 100L), ("c", "d", 90L)))
  }

  test("selectBatch rejects a candidate whose mint equals an earlier keep's mint") {
    // ('a','bc') and ('ab','c') are token-disjoint but both mint
    // 'abc' — keeping both would double-source pairs containing it
    val top = Seq(("a", "bc", 100L), ("ab", "c", 90L), ("x", "y", 80L))
    assert(sb(top, 16, truncated = false, Set.empty) == Seq(("a", "bc", 100L)))
  }

  test("selectBatch under truncation bounds by the slice minimum") {
    val top = Seq(("a", "b", 100L), ("c", "d", 90L), ("e", "f", 90L))
    // slice may be cut off: unseen pairs can hold count 90, so the
    // two keeps tying it are unsafe; strict-greater survives
    assert(sb(top, 16, truncated = true, Set.empty) == Seq(("a", "b", 100L)))
    assert(sb(Seq(("a", "b", 100L), ("c", "d", 91L), ("e", "f", 90L)), 16,
      truncated = true, Set.empty)
      == Seq(("a", "b", 100L), ("c", "d", 91L)))
  }

  // ---- end-to-end batched ≡ sequential ----

  test("batched ≡ sequential on the fixture corpus (char level, 24 merges)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
    val seq24 = sequential(docs, 24)
    assert(seq24.size == 24)
    assert(batched(docs, 24) == seq24)
    assert(batched(docs, 24, maxBatch = 4) == seq24)
  }

  test("batched ≡ sequential on the multi-byte corpus (byte level)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(coalesce($"text", lit("")), lit(" café abab "),
        element_at(array(lit("π"), lit("straße"), lit("Œuvre"),
          lit("€100 ababa")), ($"doc_id" % 4 + 1).cast("int"))).as("text"))
    val s12 = sequential(docs, 12, byteLevel = true)
    assert(s12.size == 12)
    assert(batched(docs, 12, byteLevel = true) == s12)
  }

  test("batched ≡ sequential on coincidence-dense random tiny-alphabet corpora") {
    // Words over {a,b} of length ≤ 6: shared tokens, recreated pair
    // strings and colliding mints happen every few merges — exactly
    // the cases the batch-safety proof must survive. Deterministic
    // seed; any divergence prints the corpus for replay.
    val rng = new scala.util.Random(20260816L)
    (1 to 6).foreach { trial =>
      val words = Seq.fill(12 + rng.nextInt(10)) {
        Seq.fill(1 + rng.nextInt(6))(if (rng.nextBoolean()) "a" else "b").mkString
      }
      val docs = words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
      val n = 2 + rng.nextInt(5)
      val expect =
        try Right(sequential(docs, n))
        catch { case e: IllegalArgumentException => Left(e.getMessage) }
      val got =
        try Right(batched(docs, n, maxBatch = 8))
        catch { case e: IllegalArgumentException => Left(e.getMessage) }
      (expect, got) match {
        case (Right(e), Right(g)) =>
          assert(g == e, s"trial $trial diverged on corpus $words: $g != $e")
        case (Left(_), Left(_)) => // both hit the duplicate-pair mint guard
        case other =>
          fail(s"trial $trial: one path crashed, the other didn't, on " +
            s"corpus $words: $other")
      }
    }
  }

  test("round-trip at 256 requested merges: apply replays training on every word") {
    // the r19 verdict's gate: the batched loop at two orders of
    // magnitude beyond the 12-merge oracle fixtures. sf0.001's
    // vocabulary may exhaust earlier — the round-trip must hold over
    // however many merges are learnable, and they must stay unique.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
    val learned = BpeTrainer.learn(docs, "text", nMerges = 256)
    val pairs = learned.merges.map { case (a, b, _) => (a, b) }
    assert(pairs.size >= 64, s"expected a rich merge table, got ${pairs.size}")
    assert(pairs.distinct.size == pairs.size)
    val mismatches = learned.vocab
      .select($"word",
        concat_ws(" ", $"toks").as("trained"),
        BpeMerges.bpeEncode($"word", pairs).as("applied"))
      .filter($"trained" =!= $"applied")
      .collect()
    assert(mismatches.isEmpty,
      mismatches.take(5).mkString("apply != training on: ", ", ", ""))
  }
}
