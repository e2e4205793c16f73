package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Adversarial-input locks for the text-pipeline fixes that landed
  * without companion specs: q85's first-occurrence key on documents
  * longer than any packed-key range, and q86's fixed-point BM25 at
  * term frequencies that overflowed the previous formulation.
  *
  * Both run the REAL query functions against a synthetic documents
  * table written to a temp dir — same loader path as production, so
  * the whole plan (explode → agg → join) is exercised, not a unit
  * extract.
  */
class TextEdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withDocs[T](rows: Seq[(Long, String)])(body: String => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_edge").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    body(tmp)
  }

  test("q85: >16,384-word document keeps first-occurrence attribution") {
    // 17,000 words → 1,063 chunks, so chunk indexes reach 1,062 — past
    // the 1,024-index range a doc_id*1024+idx packed key could hold
    // (doc 1's idx 1050 would alias doc 2's keyspace at 2*1024+26).
    // The struct-min key must keep attributing every chunk to doc 1.
    val words1 = (0 until 17000).map(i => s"w$i")
    val text1 = words1.mkString(" ")
    // doc 2 is an exact copy of doc 1's chunk at idx 1050
    val text2 = words1.slice(1050 * 16, 1050 * 16 + 16).mkString(" ")
    withDocs(Seq((1L, text1), (2L, text2))) { dir =>
      val out = TextQueries.paragraphDedup(spark, dir)
        .select($"doc_id", $"n_chunks", $"n_kept", $"text_dedup")
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap

      val (n1, k1, t1) = (out(1L)._1, out(1L)._2, out(1L)._3)
      assert(n1 == 1063L && k1 == 1063L,
        s"doc 1 must keep all its chunks, got n_chunks=$n1 n_kept=$k1")
      assert(t1 == text1, "doc 1 dedup text must reassemble in idx order")

      val (n2, k2, t2) = (out(2L)._1, out(2L)._2, out(2L)._3)
      assert(n2 == 1L && k2 == 0L,
        s"doc 2's only chunk first occurred in doc 1 at idx 1050, got n_kept=$k2")
      assert(t2 == "", "doc 2 must dedup to empty text")
    }
  }

  test("q86: BM25 fixed point is exact at tf = 6,000 (old form overflowed at ~4,200)") {
    // One document repeats a term 6,000 times. The pre-fix numerator
    // tf·2200·S² = 6000·2200·10¹² ≈ 1.3e19 exceeds Long.MaxValue
    // (9.2e18); the constant-numerator + quotient/remainder form must
    // instead match a BigInt evaluation of the same formula exactly.
    val hotDoc = Seq.fill(6000)("hot").mkString(" ")
    val docs = Seq((1L, hotDoc), (2L, "hot cold warm"), (3L, "hot cold warm"))
    withDocs(docs) { dir =>
      val out = TextQueries.bm25TopK(spark, dir)
        .select($"term", $"doc_id", $"tf", $"score")
        .as[(String, Long, Long, Double)].collect()

      // corpus term frequencies: hot 6002, cold 2, warm 2 → top-3 is
      // exactly {hot, cold, warm}
      assert(out.map(_._1).toSet == Set("hot", "cold", "warm"))

      val S = BigInt(1000000)
      val nDocs = BigInt(3)
      val totalLen = BigInt(6000 + 3 + 3)
      val avgdlFx = (totalLen * S) / nDocs
      def expected(dl: Long, tf: Long, df: Long): Double = {
        val normFx = BigInt(250000) + (BigInt(750000) * dl * S) / avgdlFx
        val tfCompFx = (BigInt(2200) * S * S) / (BigInt(1000) * S + (BigInt(1200) * normFx) / tf)
        val idfFx = ((nDocs + 1) * S) / (df + 1)
        val scoreFx = (idfFx / S) * tfCompFx + ((idfFx % S) * tfCompFx) / S
        assert(scoreFx.isValidLong, "fixed-point score itself must fit a Long")
        scoreFx.toDouble / 1e6
      }

      val hot1 = out.find(r => r._1 == "hot" && r._2 == 1L).get
      assert(hot1._3 == 6000L)
      assert(hot1._4 == expected(dl = 6000, tf = 6000, df = 3),
        s"tf=6000 score must match the BigInt mirror, got ${hot1._4}")
      // and a small-tf row through the same path, for contrast
      val cold2 = out.find(r => r._1 == "cold" && r._2 == 2L).get
      assert(cold2._4 == expected(dl = 3, tf = 1, df = 2))
      assert(out.forall(r => r._4 > 0.0 && r._4 < 25.0),
        "all fixed-point scores must be positive and sane")
    }
  }

  test("fixture corpus has no vertical tab (oracle \\s parity precondition)") {
    // The hash-keyed differentials (q26/q167) split on Java \s, whose
    // class includes U+000B; DuckDB's RE2 \s does not. The FNV mirror
    // now hashes UTF-8 bytes (any-corpus correct), so the one residual
    // precondition is tokenizer-boundary: no document may carry a
    // vertical tab or the two engines tokenize it differently. Pinned
    // here against the real driver fixture.
    // all three differential scales — the driver gate runs at sf0.01
    // and the round-close differential at sf0.1 too
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { dir =>
      val n = Tables.load(spark, dir, "documents")
        .filter(col("text").contains("\u000B")).count()
      assert(n == 0L, s"$dir/documents carries U+000B text — the q26/q167 " +
        "oracles' RE2 \\s would tokenize it differently from Java \\s")
    }
  }
}
