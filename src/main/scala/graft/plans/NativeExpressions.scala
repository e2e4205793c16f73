package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two text-fingerprint kernels
  * that built-in functions cannot express without exploding rows:
  *
  *  - [[SimHash64]] — 64-bit SimHash over a token array (per-bit
  *    majority vote of token hashes): the classic near-dup signature
  *    whose pairwise Hamming distance approximates cosine similarity
  *    of the token multisets.
  *  - [[RollingHash64]] — polynomial rolling hash over a string's
  *    UTF-8 bytes (document fingerprinting, SURVEY §7.5).
  *
  * Both implement `doGenCode` by emitting a call to a static kernel,
  * so they run inside whole-stage codegen (no interpreted fallback,
  * no UDF serialization) — the preferred extension point per the
  * build rules (custom Expression > UDF).
  */
object Kernels {

  /** FNV-1a 64-bit over UTF-8 bytes — stable, allocation-free. */
  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash: per-bit majority over token hashes. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Polynomial rolling hash (base 1000003) over UTF-8 bytes. */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Trading-calendar roll: date → the first trading day on-or-after it
  * (weekends + the holiday set skipped) — the codegen promotion of the
  * business-day bucket (SURVEY §4 custom-work item 1; bus_range
  * semantics, dbase/utils.py:52-68). `d` is a trading day iff
  * `roll(d) == d`, so the predicate replaces the broadcast holiday
  * anti-join with pure column arithmetic that stays inside
  * whole-stage codegen.
  *
  * `holidays` are epoch days, kept as a sorted array and carried into
  * generated code as a codegen reference object — the expression-level
  * equivalent of a broadcast holiday bitmap (holiday sets are O(10)/yr,
  * so per-task duplication is nil).
  */
case class TradingDayRoll(child: Expression, holidays: Array[Int])
  extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DateType
  override def prettyName: String = "trading_day_roll"

  def roll(epochDay: Int): Int = {
    var d = epochDay
    // epoch day 0 = 1970-01-01, a Thursday: (d+4)%7 gives 0=Sunday…6=Saturday
    var dow = java.lang.Math.floorMod(d + 4, 7)
    while (dow == 0 || dow == 6 || java.util.Arrays.binarySearch(holidays, d) >= 0) {
      d += 1
      dow = java.lang.Math.floorMod(d + 4, 7)
    }
    d
  }

  override protected def nullSafeEval(input: Any): Any =
    roll(input.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("roller", this, classOf[TradingDayRoll].getName)
    defineCodeGen(ctx, ev, c => s"$ref.roll($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TradingDayRoll =
    copy(child = newChild)

  // Array[Int] equality is by reference; compare holiday contents so
  // plan canonicalization/dedup treats equal calendars as equal.
  override def equals(other: Any): Boolean = other match {
    case t: TradingDayRoll =>
      child == t.child && java.util.Arrays.equals(holidays, t.holidays)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(holidays)
}

case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** Column wrappers + SQL registration. */
object NativeFunctions {

  import org.apache.spark.sql.graftshim.ColumnShim

  def simhash64(c: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(c)))

  def rollingHash64(c: Column): Column =
    ColumnShim.column(RollingHash64(ColumnShim.expression(c)))

  /** Date → first trading day on-or-after, skipping weekends and the
    * given `yyyy-MM-dd` holidays.
    */
  def tradingDayRoll(c: Column, holidays: Seq[String]): Column =
    ColumnShim.column(TradingDayRoll(ColumnShim.expression(c),
      holidays.map(d => java.time.LocalDate.parse(d).toEpochDay.toInt)
        .sorted.toArray))

  /** Native bloom-filter pair — the exact mechanism Spark's runtime
    * row-level filtering injects, exposed as columns: build the
    * sketch with an aggregate over `xxhash64(col)` values, probe with
    * the codegen [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * on a binary literal. Unlike `df.stat.bloomFilter` + a Scala UDF,
    * the probe stays inside whole-stage codegen — no closure
    * serialization per row on a path that sees one row per shingle.
    */
  def bloomAgg(hashed: Column, expectedItems: Long, fpp: Double): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    ColumnShim.column(new BloomFilterAggregate(ColumnShim.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Codegen membership probe against a driver-built bloom binary;
    * `hashed` must be the same `xxhash64(col)` used to build.
    */
  def bloomMightContain(bloom: Array[Byte], hashed: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    ColumnShim.column(BloomFilterMightContain(
      Literal(bloom, org.apache.spark.sql.types.BinaryType),
      ColumnShim.expression(hashed)))
  }

  /** Register the native functions for `spark.sql` use (engine-level
    * function surface; same builders as [[GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "trading_day_roll", exprs => GraftExtensions.buildTradingDayRoll(exprs),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_top_k", exprs => GraftExtensions.buildBoundedTopK(exprs),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_rank_top_k", exprs => GraftExtensions.buildBoundedRankTopK(exprs),
      "built-in")
  }
}
