package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding APPLY — real merge-table tokenization, closing
  * the gap between the q20/q92 `chars/4` token ESTIMATE and actual
  * token budgeting. This is the serving-side half of BPE (Sennrich
  * 2016 §3; the GPT-2 `bpe()` loop): the merge table is trained
  * offline and ships as a bounded artifact, so it enters the plan as
  * an expression constant — the PQ-codebook literal discipline — and
  * the corpus side stays ONE map-only codegen scan, no shuffle, no
  * broadcast, at any corpus size.
  *
  * Semantics (the true tokenizer loop, not the once-per-merge
  * shortcut): per word, start from characters; repeatedly find the
  * LOWEST-RANK adjacent pair present and merge every occurrence
  * left-to-right; stop when no table pair remains. The two differ
  * exactly when a later-rank merge creates an earlier-rank pair
  * ([[BpeMerges.default]] ranks 6/7 construct that case; CrawlSpec
  * asserts it), so the loop order is load-bearing.
  *
  * Words are whitespace runs of the input (this corpus is already
  * pre-tokenized text; compose with the q27 regex pre-tokenizer for
  * raw prose); output is every word's tokens joined by single spaces
  * — replayable downstream as `split(out, ' ')`.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  /** rank by "a b" pair key; lower = earlier-trained = higher priority. */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  def encode(text: UTF8String): UTF8String = {
    val words = text.toString.split("\\s+")
    val out = new java.lang.StringBuilder(text.numChars() * 2)
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var toks = new java.util.ArrayList[String](w.length)
        if (byteLevel) {
          // UTF-8 byte seeding, each byte rendered through the GPT-2
          // byte→unicode table ([[GptBytes]]) so multi-byte text
          // tokenizes at the byte level and tokens stay space-free
          val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var bi = 0
          while (bi < bytes.length) {
            toks.add(GptBytes.token(bytes(bi) & 0xff))
            bi += 1
          }
        } else {
          // char-level seeding per CODE POINT, not UTF-16 code unit:
          // the trainer seeds via split(word, "") and the oracle via
          // substr(word, i, 1), both code-point-wise — a surrogate
          // pair split into two lone-surrogate tokens could never be
          // fused by any learned merge, silently breaking the q168
          // train/apply round-trip on non-BMP text (CrawlSpec pins an
          // astral-plane corpus)
          var ci = 0
          while (ci < w.length) {
            val n = Character.charCount(w.codePointAt(ci))
            toks.add(w.substring(ci, ci + n))
            ci += n
          }
        }
        var done = false
        while (!done && toks.size > 1) {
          // lowest-rank adjacent pair present in this word
          var best = -1
          var bestRank = Integer.MAX_VALUE
          var i = 0
          while (i < toks.size - 1) {
            val r = rank.get(toks.get(i) + " " + toks.get(i + 1))
            if (r != null && r < bestRank) { bestRank = r; best = i }
            i += 1
          }
          if (best < 0) done = true
          else {
            val a = toks.get(best)
            val b = toks.get(best + 1)
            // merge every occurrence left-to-right (non-overlapping)
            val next = new java.util.ArrayList[String](toks.size)
            var j = 0
            while (j < toks.size) {
              if (j < toks.size - 1 && toks.get(j) == a && toks.get(j + 1) == b) {
                next.add(a + b); j += 2
              } else { next.add(toks.get(j)); j += 1 }
            }
            toks = next
          }
        }
        var t = 0
        while (t < toks.size) {
          if (out.length() > 0) out.append(' ')
          out.append(toks.get(t))
          t += 1
        }
      }
      wi += 1
    }
    UTF8String.fromString(out.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** The GPT-2 byte encoder (Radford 2019, encoder.py
  * `bytes_to_unicode`): a bijection from the 256 byte values to
  * printable unicode code points, so byte-level BPE tokens are plain
  * space-free strings. Printable bytes (33–126, 161–172, 174–255)
  * map to themselves as code points; the excluded bytes (controls,
  * space, DEL, 127–160, 173) map — in ascending byte order — to
  * 256, 257, … (e.g. the space byte becomes U+0120 'Ġ', the familiar
  * GPT-2 word-boundary glyph). The DuckDB oracle mirrors this with
  * `chr()` arithmetic, so the mapping must stay exactly this table.
  */
object GptBytes {
  val table: Array[String] = {
    val arr = new Array[String](256)
    var next = 256
    var b = 0
    while (b < 256) {
      val printable =
        (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)
      if (printable) arr(b) = String.valueOf(b.toChar)
      else { arr(b) = String.valueOf(next.toChar); next += 1 }
      b += 1
    }
    arr
  }

  def token(b: Int): String = table(b)
}

/** UTF-8 bytes of a string rendered through the [[GptBytes]] table as
  * an `array<string>` of single-char byte tokens — the BYTE-level
  * seeding column for [[graft.operators.BpeTrainer]] (the training
  * side of [[BpeEncode]]'s byte mode, which seeds the same way
  * inline). One codegen projection; the trainer's merge loop is
  * alphabet-agnostic above this.
  */
case class GptByteTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gpt_byte_tokens"

  def tokens(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val out = new Array[AnyRef](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = UTF8String.fromString(GptBytes.token(bytes(i) & 0xff))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gptBytes", this, classOf[GptByteTokens].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GptByteTokens =
    copy(child = newChild)
}

/** Left-to-right non-overlapping merge of one (left, right) pair over
  * an `array<string>` token column — see [[BpeMerges.mergePair]] for
  * semantics. The pair is bound at plan time (expression constants,
  * the PQ-codebook literal discipline), so each training round is one
  * map-only codegen projection over the vocabulary frame.
  */
case class BpeMergePair(child: Expression, left: String, right: String)
  extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_pair"

  @transient private lazy val a = UTF8String.fromString(left)
  @transient private lazy val b = UTF8String.fromString(right)
  @transient private lazy val ab = UTF8String.fromString(left + right)

  def mergePass(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && a.equals(arr.getUTF8String(i)) &&
          b.equals(arr.getUTF8String(i + 1))) {
        out.add(ab); i += 2
      } else { out.add(arr.getUTF8String(i)); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    mergePass(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerge", this, classOf[BpeMergePair].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mergePass($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

/** The shipped merge table. A real deployment loads this from the
  * tokenizer artifact; this fixed table is trained-shaped for the
  * test corpus vocabulary and deliberately contains a rank INVERSION
  * — rank 5 `(s, ca)` is applicable only after rank 6 `(c, a)` fires
  * — so any implementation taking the once-per-merge shortcut
  * diverges on the word `scan` (CrawlSpec pins this; the DuckDB
  * oracle replays the same loop via a recursive CTE).
  */
object BpeMerges {
  val default: Seq[(String, String)] = Seq(
    "e" -> "r", "t" -> "a", "ta" -> "b", "l" -> "e", "tab" -> "le",
    "s" -> "ca", "c" -> "a", "sca" -> "n", "i" -> "n", "o" -> "w",
    "in" -> "d", "w" -> "ind", "wind" -> "ow", "v" -> "a", "va" -> "l",
    "u" -> "e", "val" -> "ue", "s" -> "t", "st" -> "r", "e" -> "a",
    "str" -> "ea", "strea" -> "m", "r" -> "t", "o" -> "rt", "s" -> "ort")

  def bpeEncode(c: Column): Column = bpeEncode(c, default)

  /** Encode with an explicit merge table — the serving path for
    * merges LEARNED by [[graft.operators.BpeTrainer]] (the round-trip
    * contract: apply-with-learned-table reproduces the training
    * tokenization, CrawlSpec).
    */
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(BpeEncode(ColumnShim.expression(c), requireUniquePairs(merges)))
  }

  /** Byte-level encode: per-word seed tokens are the UTF-8 BYTES of
    * the word rendered through [[GptBytes]] (the GPT-2 convention),
    * so multi-byte text tokenizes without any char-level assumption;
    * `merges` pairs are strings over the same byte alphabet.
    */
  def bpeEncodeBytes(c: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(BpeEncode(ColumnShim.expression(c),
      requireUniquePairs(merges), byteLevel = true))
  }

  /** One left-to-right non-overlapping merge pass of (`left`,`right`)
    * over a token array — the training-side re-tokenization kernel
    * ([[graft.operators.BpeTrainer]]), the same pass semantics as one
    * iteration of [[BpeEncode.encode]]'s inner loop. A single pass is
    * EXHAUSTIVE for its own pair: a merged token `left+right` can
    * never recreate the pair with a neighbor (it differs from both
    * `left` and `right` by length), so after the pass no adjacent
    * (`left`,`right`) remains — which is what lets the trainer
    * re-count pairs immediately after one pass per round.
    */
  def mergePair(toks: Column, left: String, right: String): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(BpeMergePair(ColumnShim.expression(toks), left, right))
  }

  /** SQL builder: `bpe_encode(text[, array('a b', ...)])` — optional
    * literal merge strings ("left right"), default table otherwise.
    */
  private[plans] def build(exprs: Seq[Expression]): BpeEncode = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val merges = exprs.lift(1) match {
      case None => default
      case Some(m) if m.foldable =>
        m.eval() match {
          // a NULL literal is foldable too — it must hit the clean
          // error, not an NPE inside numElements()
          case arr: ArrayData =>
            (0 until arr.numElements()).map { i =>
              val el = arr.getUTF8String(i)
              if (el == null) throw new IllegalArgumentException(
                "bpe_encode merges must not contain null entries")
              el.toString.split(" ", 2) match {
                case Array(a, b) => (a, b)
                case _ => throw new IllegalArgumentException(
                  "bpe_encode merges must be 'left right' pairs")
              }
            }
          case _ => throw new IllegalArgumentException(
            "bpe_encode merges must be a non-null literal array of 'left right' strings")
        }
      case Some(_) => throw new IllegalArgumentException(
        "bpe_encode merges must be a literal array of 'left right' strings")
    }
    BpeEncode(exprs.head, requireUniquePairs(merges))
  }

  /** A merge table must rank each pair ONCE: the engine's rank map is
    * keyed by pair, so a duplicate would silently let the LAST
    * occurrence's rank win — the opposite of the putIfAbsent /
    * first-occurrence semantics of standard BPE merge files (and of
    * the DuckDB oracle's `ORDER BY rk LIMIT 1`). Rejected loudly here
    * (the profile-typo rule) rather than deduped: a duplicated pair
    * means the table artifact itself is malformed.
    */
  private[plans] def requireUniquePairs(
      merges: Seq[(String, String)]): Seq[(String, String)] = {
    val seen = scala.collection.mutable.HashSet.empty[(String, String)]
    merges.foreach { p =>
      if (!seen.add(p)) throw new IllegalArgumentException(
        s"bpe_encode merges contain duplicate pair '${p._1} ${p._2}' — " +
          "each pair may carry exactly one rank")
    }
    merges
  }
}
