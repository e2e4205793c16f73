package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CrawlOps
import graft.plans.BpeMerges
import graft.queries.CrawlQueries

/** Crawl-extraction family locks (q162–q164): the sanitizer ordering
  * and link-density edges of the HTML strip, the scheme-aware port
  * cases of URL canonicalization, the TRUE-loop-order contract of the
  * BPE apply, and the families' plan shapes (stateless scans; one
  * keyed agg for the host rollup).
  */
class CrawlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head.get(0)

  private def extract(html: String): (String, Long, Long) = {
    val r = Seq(1).toDF("x")
      .select(CrawlOps.extractMainText(lit(html)).as("e"))
      .select($"e.clean_text", $"e.n_blocks_kept", $"e.n_blocks_dropped").head
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  // ---- q162: HTML main-text extraction ----

  test("entities decode AFTER tag strip: escaped tags survive as text") {
    // if decode ran first, '&lt;script&gt;' would become a real tag and
    // be stripped (or worse, swallow the rest) — the sanitizer bug
    val (txt, kept, dropped) = extract(
      "<p>&lt;script&gt;x&lt;/script&gt; hello world from a long enough paragraph</p>")
    assert(txt == "<script>x</script> hello world from a long enough paragraph")
    assert(kept == 1L && dropped == 0L)
  }

  test("head, script, style and comments are stripped wholesale") {
    val (txt, kept, _) = extract(
      "<html><head><title>T</title><style>p{}</style></head><body>" +
        "<!-- note --><script>var a='</p>';</script>" +
        "<p>only the body paragraph text remains here</p></body></html>")
    assert(txt == "only the body paragraph text remains here")
    assert(kept == 1L)
  }

  test("link-density: all-links nav drops, in-prose link keeps, boundary is <=") {
    val (txt, kept, dropped) = extract(
      "<div><a href='/'>Home</a> <a href='/a'>About</a></div>" +
        "<p>prose with one <a href='/r'>link</a> inside a long paragraph body</p>")
    assert(txt == "prose with one link inside a long paragraph body")
    assert(kept == 1L && dropped == 1L)
    // exactly at the 1/3 boundary: 12 link chars, 36 text chars (11 +
    // space + 12 + space + 11 — tag strip inserts the spaces) → kept
    val (t2, k2, d2) = extract("<p>abcdefghijk<a href='x'>linkedtxtabc</a>abcdefghijk</p>")
    assert(t2.length == 36 && k2 == 1L && d2 == 0L, s"got '$t2' $k2/$d2")
    // one char fewer of plain text → over the boundary → dropped
    val (_, k3, d3) = extract("<p>abcdefghijk<a href='x'>linkedtxtabc</a>abcdefghij</p>")
    assert(k3 == 0L && d3 == 1L)
  }

  test("link density counts VISIBLE anchor chars — markup inside <a> doesn't inflate it") {
    // numerator and denominator must measure the same thing: an anchor
    // wrapping an <img> (or entity-bearing text) contributes its
    // visible characters only. Raw-inner-HTML counting would score
    // this block 58/35 link chars and wrongly drop the content.
    val (txt, kept, dropped) = extract(
      "<p>a nice long paragraph of content prose <a href='/r'>" +
        "<img src='/very/long/asset/path/banner.png' alt=''/>go</a></p>")
    assert(txt == "a nice long paragraph of content prose go")
    assert(kept == 1L && dropped == 0L, s"kept=$kept dropped=$dropped for '$txt'")
    // entity in anchor text: counts decoded (1 char for &amp;), same
    // measure the denominator's text length uses
    val (_, k2, d2) = extract("<p>abcdefghijk<a href='x'>linkedtx&amp;abc</a>abcdefghijk</p>")
    assert(k2 == 1L && d2 == 0L, "12 visible anchor chars of 36 = exactly the boundary")
  }

  test("duplicate pairs in a user-supplied merge table are rejected loudly") {
    // a HashMap-keyed rank would silently let the LAST rank win —
    // the opposite of standard first-occurrence BPE merge semantics
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_encode('scan', array('a b', 'c d', 'a b'))").collect()
    }
    assert(e.getMessage.contains("duplicate pair 'a b'"), e.getMessage)
    // distinct pairs sharing a LEFT token are fine (the default table
    // has three 's …' merges)
    assert(spark.sql("SELECT bpe_encode('ab abc', array('a b', 'ab c')) AS r")
      .head.getString(0) == "ab abc")
  }

  test("tag-only fragments count as neither kept nor dropped") {
    val (txt, kept, dropped) = extract("<div></div><p>real paragraph text here</p></body></html>")
    assert(txt == "real paragraph text here")
    assert(kept == 1L && dropped == 0L)
  }

  // ---- q163: URL canonicalization ----

  private def canon(url: String): Any = one(CrawlOps.canonicalUrl(lit(url)))

  test("canonicalization: case, www, tracking params, sort, fragment, trailing slash") {
    assert(canon("HTTP://WWW.Foo.Example.COM:80/A/b/?utm_source=x&z=2&a=3#frag")
      == "http://foo.example.com/A/b?a=3&z=2")
  }

  test("default ports drop only for the matching scheme") {
    assert(canon("https://h.example.com:443/x") == "https://h.example.com/x")
    assert(canon("http://h.example.com:80/x") == "http://h.example.com/x")
    // the cross cases: non-default for THAT scheme → kept
    assert(canon("http://h.example.com:443/x") == "http://h.example.com:443/x")
    assert(canon("https://h.example.com:80/x") == "https://h.example.com:80/x")
    assert(canon("https://h.example.com:8080/x") == "https://h.example.com:8080/x")
  }

  test("root path normalizes to '/', empty query drops, malformed → NULL") {
    assert(canon("https://h.example.com") == "https://h.example.com/")
    assert(canon("https://h.example.com/?utm_only=1") == "https://h.example.com/")
    assert(canon("not a url") == null)
  }

  test("userinfo never poisons the host; IPv6 ports split at the END") {
    assert(canon("https://alice@WWW.Example.com/x") == "https://example.com/x")
    assert(one(CrawlOps.canonicalHost(lit("https://u@WWW.H.example.com:8443/")))
      == "h.example.com")
    // an IPv6 literal's colons live inside [...]: a first-colon split
    // would cut the host at '[2001'
    assert(canon("http://[2001:db8::1]:8080/x") == "http://[2001:db8::1]:8080/x")
    assert(canon("http://[2001:db8::1]:80/x") == "http://[2001:db8::1]/x")
  }

  // ---- q164: BPE apply ----

  private def bpe(text: String): String =
    one(BpeMerges.bpeEncode(lit(text))).asInstanceOf[String]

  test("true loop order: the rank inversion fully merges 'scan'") {
    // (c,a) ranks AFTER (s,ca), yet must fire FIRST to enable it
    assert(bpe("scan") == "scan")
    // the once-per-merge shortcut, replayed here, diverges — proving
    // the engine cannot take it and the table exercises the case
    val shortcut = BpeMerges.default.foldLeft("s c a n".split(" ").toList) {
      case (toks, (a, b)) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < toks.length)
          if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2
          } else { out += toks(i); i += 1 }
        out.toList
    }.mkString(" ")
    assert(shortcut == "s ca n", s"shortcut gave '$shortcut'")
    assert(shortcut != bpe("scan"))
  }

  test("merges apply lowest-rank-first and exhaustively; unknown pairs stay") {
    assert(bpe("table") == "table")
    assert(bpe("window") == "window")
    assert(bpe("the") == "t h e") // no applicable merges
    assert(bpe("data") == "d a ta") // partial merge only
    assert(bpe("order merge") == "o r d er m er g e") // (e,r) everywhere
  }

  test("whitespace runs split words; empties vanish; output is replayable") {
    assert(bpe("scan  the") == "scan t h e")
    assert(bpe(" scan ") == "scan")
    assert(bpe("") == "")
  }

  test("q162/q164 hold on adversarial corpus rows (HTML chars, empty/null text)") {
    // the fixture entity-escapes its text, so the engine's
    // strip+decode must round-trip HTML-special characters back to
    // the raw text — the oracle's ground truth for ANY corpus
    val tmp = java.nio.file.Files.createTempDirectory("crawl_edge").toString
    Seq((0L, "a < b & c > d scan", "en", "src0"), (1L, "", "en", "src1"),
        (2L, "only\ttabs\nhere", "en", "src2"),
        (3L, null.asInstanceOf[String], "en", "src3"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val html = CrawlQueries.htmlExtract(spark, tmp).collect()
    assert(html(0).getString(1).startsWith("a < b & c > d scan see reference"),
      html(0).getString(1))
    // empty text: the suffix LEADS the block — no leading space (the
    // oracle's outer ltrim mirrors exactly this)
    assert(html(1).getString(1).startsWith("see reference notes & more <raw>"),
      html(1).getString(1))
    val bpeRows = CrawlQueries.bpeApply(spark, tmp).collect()
    // empty text → ZERO tokens (not a phantom ""-token), sig = md5("")
    assert(bpeRows(1).getLong(1) == 0L, bpeRows(1).toString)
    assert(bpeRows(1).getString(2) == "d41d8cd98f00b204e9800998ecf8427e")
    // \t/\n split words exactly like spaces
    assert(bpeRows(2).getLong(1) ==
      bpe("only tabs here").split(" ").length)
    // null text behaves as empty — matches the oracle's LEFT JOIN
    assert(bpeRows(3).getLong(1) == 0L, bpeRows(3).toString)
    assert(bpeRows(3).getString(2) == "d41d8cd98f00b204e9800998ecf8427e")
    // q168 (train→apply) inherits the same null/empty contract, with
    // merges learned from this corpus rather than shipped
    val pipe = CrawlQueries.bpePipeline(spark, tmp).collect()
    assert(pipe(1).getLong(1) == 0L && pipe(3).getLong(1) == 0L)
    assert(pipe(1).getString(2) == "d41d8cd98f00b204e9800998ecf8427e")
    assert(pipe(0).getLong(1) > 0L)
  }

  test("userinfo strip is greedy to the LAST @ (passwords may contain @)") {
    assert(one(CrawlOps.canonicalHost(lit("http://user:p@ss@www.example.com/x")))
      == "example.com")
  }

  // ---- q166: byte-level BPE ----

  private def bpeB(text: String): String =
    one(BpeMerges.bpeEncodeBytes(lit(text), CrawlQueries.byteMerges))
      .asInstanceOf[String]

  test("GptBytes is the GPT-2 byte table: bijective, printable-identity, Ġ-space") {
    import graft.plans.GptBytes
    assert(GptBytes.table.distinct.length == 256, "byte→char map must be a bijection")
    assert(GptBytes.token('A'.toInt) == "A" && GptBytes.token(0xC3) == "Ã")
    assert(GptBytes.token(' '.toInt) == "Ġ", "space must map to the GPT-2 Ġ")
    assert(GptBytes.token(0) == "Ā" && GptBytes.token(173) == "Ń")
  }

  test("byte seeding tokenizes multi-byte text at the byte level") {
    // 'é' = 0xC3 0xA9 → ('Ã','©') → merged, then folded into café
    assert(bpeB("café") == "cafÃ©")
    // '€' = 3 bytes, two ranks to fold; digits stay single bytes
    assert(bpeB("€100") == "âĤ¬ 1 0 0")
    // 'ß' shares the 0xC3 lead byte with 'é' but merges via rank 6
    assert(bpeB("straße") == "str a ÃŁ e")
    // 'π' = 0xCF 0x80, no merge for the pair — two byte tokens remain
    assert(bpeB("π") == "Ï Ģ")
  }

  test("byte table's rank inversion: exhaust-then-rescan, not re-select-per-merge") {
    // merging (a,b) CREATES (ab,a) occurrences of LOWER rank; the
    // engine exhausts (a,b) first ('ab ab'), a strategy that
    // re-selects the lowest rank after each single merge reads 'aba b'
    assert(bpeB("abab") == "ab ab")
    assert(bpeB("ababa") == "ab aba")
    // the divergent strategy, replayed here (the q164 shortcut rule):
    // merge ONE occurrence, then re-select lowest applicable rank
    var toks = List("a", "b", "a", "b")
    var cont = true
    while (cont) {
      val best = CrawlQueries.byteMerges.zipWithIndex
        .filter { case ((a, b), _) =>
          toks.sliding(2).exists(p => p == List(a, b)) }
        .sortBy(_._2).headOption
      best match {
        case None => cont = false
        case Some(((a, b), _)) =>
          val i = toks.sliding(2).indexWhere(p => p == List(a, b))
          toks = toks.take(i) ++ List(a + b) ++ toks.drop(i + 2)
      }
    }
    assert(toks.mkString(" ") == "aba b", s"unpinned replay gave '${toks.mkString(" ")}'")
    assert(toks.mkString(" ") != bpeB("abab"))
  }

  // ---- q165: BPE training ----

  private def pass(toks: Seq[String], a: String, b: String): Seq[String] =
    Seq(1).toDF("x")
      .select(BpeMerges.mergePair(
        typedLit(toks), a, b).as("r"))
      .head.getSeq[String](0)

  test("merge pass is left-to-right, non-overlapping, and exhaustive in one pass") {
    assert(pass(Seq("a", "b", "c"), "a", "b") == Seq("ab", "c"))
    // same-token runs: LEFT-to-right — [a,a,a] pairs at 0, not 1
    assert(pass(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(pass(Seq("a", "a", "a", "a", "a"), "a", "a") == Seq("aa", "aa", "a"))
    // back-to-back occurrences both merge in ONE pass (a replace-all
    // over a space-joined form would miss the second — the scan
    // consumes the shared delimiter; the oracle's leftmost surgery
    // and this pass agree instead)
    assert(pass(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // exhaustive: no adjacent (a,b) can survive its own pass
    val out = pass(Seq("a", "b", "b", "a", "b", "a"), "a", "b")
    assert(out == Seq("ab", "b", "ab", "a"))
    assert(!out.sliding(2).exists(p => p == Seq("a", "b")))
  }

  test("training learns the hand-checked table and stops when merges are exhausted") {
    import graft.operators.BpeTrainer
    // low ×3, lower ×1 — the Sennrich walkthrough corpus: (l,o) and
    // (o,w) tie at 4, byte order picks (l,o); after (lo,w) the only
    // pairs are singletons, (e,r) wins on byte order, then (low,er)
    val docs = Seq("low low", "low lower").toDF("text")
    val learned = BpeTrainer.learn(docs, "text", nMerges = 10)
    assert(learned.merges == Seq(
      ("l", "o", 4L), ("lo", "w", 4L), ("e", "r", 1L), ("low", "er", 1L)),
      learned.merges.toString)
    // early exhaustion: 10 requested, 4 learnable — ranks stay contiguous
    val voc = learned.vocab.orderBy($"word").collect()
    assert(voc.map(r => (r.getString(0), r.getSeq[String](2).mkString(" "))).toSeq
      == Seq(("low", "low"), ("lower", "lower")))
  }

  test("round-trip: BpeEncode with the learned table reproduces training tokenization") {
    import graft.operators.BpeTrainer
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
    val learned = BpeTrainer.learn(docs, "text", nMerges = 12)
    val pairs = learned.merges.map { case (a, b, _) => (a, b) }
    assert(pairs.size == 12 && pairs.distinct.size == 12)
    // apply's lowest-rank-first loop must replay the training order on
    // EVERY vocabulary word — the artifact contract between trainer
    // and encoder
    val mismatches = learned.vocab
      .select($"word",
        concat_ws(" ", $"toks").as("trained"),
        BpeMerges.bpeEncode($"word", pairs).as("applied"))
      .filter($"trained" =!= $"applied")
      .collect()
    assert(mismatches.isEmpty,
      mismatches.take(5).mkString("apply != training on: ", ", ", ""))
  }

  test("byte-level training learns multi-byte merges and round-trips through byte apply") {
    import graft.operators.BpeTrainer
    // café ×3, straße ×1: the four café byte pairs tie at 3 — byte
    // order cascades from (a,f), so é's continuation byte '©' is
    // folded by rank 3 as ('afÃ','©'): a merge CROSSING the
    // code-point boundary (the left token ends mid-é), which only a
    // byte-level alphabet can express; straße's pairs (count 1)
    // follow, folding ß the same way ('aÃ','Ł')
    val docs = Seq("café café", "café straße").toDF("text")
    val learned = BpeTrainer.learn(docs, "text", nMerges = 6, byteLevel = true)
    val pairs = learned.merges.map { case (a, b, _) => (a, b) }
    assert(pairs.take(3).contains(("afÃ", "©")),
      s"é's continuation byte must fold across the code-point boundary, got $pairs")
    assert(pairs.exists { case (a, b) => a.endsWith("Ã") && b == "Ł" },
      s"ß's continuation byte must fold too, got $pairs")
    assert(learned.merges.take(4).forall(_._3 == 3L), learned.merges.toString)
    // round-trip through the BYTE apply: seeding must agree end to end
    val mism = learned.vocab.select(
      concat_ws(" ", $"toks").as("trained"),
      BpeMerges.bpeEncodeBytes($"word", pairs).as("applied"))
      .filter($"trained" =!= $"applied").collect()
    assert(mism.isEmpty, mism.mkString(","))
    // the seeding expression itself: one token per UTF-8 byte
    val toks = Seq("café").toDF("w").select(
      org.apache.spark.sql.graftshim.ColumnShim.column(
        graft.plans.GptByteTokens(
          org.apache.spark.sql.graftshim.ColumnShim.expression($"w"))).as("t"))
      .head.getSeq[String](0)
    assert(toks == Seq("c", "a", "f", "Ã", "©"))
  }

  test("char seeding is per CODE POINT: astral text trains AND applies as one token") {
    // U+1D11E is a surrogate pair in UTF-16; code-UNIT seeding would
    // emit two lone-surrogate tokens no learned merge could fuse —
    // apply would diverge from training (split(word,"")/substr are
    // both code-point-wise) and the q168 round-trip would break
    val clef = "𝄞"
    assert(bpe(s"${clef}x") == s"$clef x")
    import graft.operators.BpeTrainer
    val docs = Seq(s"$clef$clef$clef a", s"$clef$clef b").toDF("text")
    val learned = BpeTrainer.learn(docs, "text", nMerges = 4)
    assert(learned.merges.head._1 == clef && learned.merges.head._2 == clef,
      learned.merges.toString)
    val pairs = learned.merges.map { case (a, b, _) => (a, b) }
    val mism = learned.vocab.select(
      concat_ws(" ", $"toks").as("trained"),
      BpeMerges.bpeEncode($"word", pairs).as("applied"))
      .filter($"trained" =!= $"applied").collect()
    assert(mism.isEmpty, mism.mkString(","))
  }

  test("q165's merge-pair expression stays inside whole-stage codegen") {
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.plans.BpeMergePair]))
  }

  // ---- plan shapes: the 100 TB contract ----

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q162/q164/q168 are stateless scans: no exchange before the presentation sort") {
    // q168's TRAINING runs at plan-build time (bounded vocab rounds);
    // the plan under test is the APPLY — which must stay the q164
    // shape even with a learned (non-literal-in-source) merge table
    for (q <- Seq(CrawlQueries.htmlExtract(spark, dir),
        CrawlQueries.bpeApply(spark, dir),
        CrawlQueries.bpePipeline(spark, dir))) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"extraction must not shuffle:\n${p.take(600)}")
      assert(!p.contains("Window"), p.take(300))
    }
  }

  test("q163: keyed rollup with map-side partial combine, no extra exchange") {
    val p = plan(CrawlQueries.urlCanonicalize(spark, dir))
    // count_distinct expands to the standard two-level plan: partial
    // agg by (host, canon) → exchange → merge → exchange on host —
    // the second exchange carries ALREADY-DEDUPED keys (≤ one row per
    // distinct url), so it is scan-size-independent. Anything beyond
    // those two means the canonicalization itself started shuffling.
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"host rollup = distinct pair only, saw $exchanges:\n${p.take(900)}")
    assert(p.contains("partial_count"), "map-side partial aggregation expected\n" + p.take(600))
  }

  test("q164: the BPE scan stays inside whole-stage codegen") {
    // a CodegenFallback expression would break the codegen span
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.plans.BpeEncode]))
    val df = CrawlQueries.bpeApply(spark, dir)
    df.collect() // AQE: codegen spans materialize only in the FINAL plan
    val p = df.queryExecution.executedPlan.toString
    // '*(n)' is the WholeStageCodegen span marker in the compact plan
    // string — the projection computing bpe_encode must carry one
    assert(p.linesIterator.exists(l => l.contains("bpe_encode") && l.contains("*(")),
      s"bpe_encode projection not inside a codegen span:\n${p.take(700)}")
  }

  test("q172: persisted artifact round-trip equals the in-plan train→apply (q168)") {
    // train → JDBC store → fresh-session reload → apply must be
    // byte-identical to q168's single-plan lifecycle on the same
    // corpus — persistence adds nothing and loses nothing
    val inPlan = CrawlQueries.bpePipeline(spark, dir).collect().toSeq
    val reloaded = CrawlQueries.bpeArtifact(spark, dir).collect().toSeq
    assert(reloaded == inPlan)
    // and the apply half keeps the q164 stateless-scan shape
    val p = plan(CrawlQueries.bpeArtifact(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      s"reloaded-artifact apply must not shuffle:\n${p.take(600)}")
  }

  test("q171: pushed type filter + pruned columns reach the WARC scan; no exchange") {
    val df = CrawlQueries.warcExtract(spark, dir)
    val p = plan(df)
    assert(p.contains("WarcScan"), p.take(400))
    // the response-only filter prunes at the reader, not post-scan
    assert(p.contains("EqualTo(warc_type,response)"), p.take(600))
    // projection pruning: the scan reads only what the query uses
    assert(p.contains("cols=url,n_bytes,payload"), p.take(600))
    // extraction is map-only — nothing shuffles before the
    // presentation sort (the q162 contract, one tier earlier)
    assert(!p.contains("Exchange hashpartitioning"),
      s"WARC extraction must not shuffle:\n${p.take(600)}")
  }
}
