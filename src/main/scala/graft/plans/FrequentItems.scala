package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, MapType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch: `m` counters per aggregation
  * buffer, guaranteeing every item with true frequency > n/(m+1)
  * survives to the output (n = total non-null inputs).
  *
  * This is the bounded-state candidate generator for corpus-wide
  * vocabulary/heavy-hitter extraction: the naive
  * `groupBy(token).count.filter(cnt > n/(m+1))` shuffles the ENTIRE
  * vocabulary — at 100 TB of text that is billions of distinct tokens
  * through the exchange to answer a question whose output is ≤ m rows.
  * The sketch keeps O(m) state per map task, ships ≤ m (item, count)
  * pairs per partition, and merges with the count-sum + (m+1)-th-
  * largest-count subtraction rule of Agarwal et al., "Mergeable
  * Summaries" (PODS 2012), which preserves the frequency guarantee
  * under any merge tree — exactly what Spark's partial/final
  * aggregation needs. Like the engine's Bloom and LSH operators, the
  * sketch only PROPOSES: an exact recount join over the ≤ m candidates
  * turns the superset into the exact answer (see
  * `TextQueries.heavyHitters`).
  *
  * Counters are lower bounds on true frequency (decrements only), so
  * the emitted counts are safe for pre-filtering but the recount is
  * what the final `cnt * (m+1) > n` predicate must use. Output:
  * array of `struct(item, cnt)`, count-descending then item-ascending
  * (deterministic regardless of input partitioning).
  */
case class MisraGries(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  require(m >= 1, s"misra_gries requires m >= 1, got $m")

  // Map-keyed counting needs value equality on the JVM object. All
  // atomic types provide it directly except binary (Array[Byte] is
  // reference-equal), which is wrapped in [[MisraGries.ByteKey]];
  // nested struct/array/map values may alias reused input buffers AND
  // mix value classes with different equals contracts (UnsafeRow vs
  // GenericInternalRow), so they are rejected at analysis.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType | _: ArrayType | _: MapType =>
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries supports atomic item types, got ${child.dataType.catalogString}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  private lazy val isBinary = child.dataType == BinaryType

  private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  private lazy val pairSchema: StructType = StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(pairSchema, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  // Binary values become value-equal ByteKeys; everything else is its
  // own map key. Lookup wraps WITHOUT copying (the wrapped array may
  // be buffer-backed; equality doesn't retain it).
  private def keyOf(v: Any): Any =
    if (isBinary) new MisraGries.ByteKey(v.asInstanceOf[Array[Byte]]) else v

  private def unwrap(k: Any): Any = k match {
    case b: MisraGries.ByteKey => b.bytes
    case o => o
  }

  // Inputs may hand us buffer-backed values (UTF8String or a binary
  // slice over a reused row); copy only when an item is actually
  // retained.
  private def owned(k: Any): Any = k match {
    case s: UTF8String => s.copy()
    case b: MisraGries.ByteKey => new MisraGries.ByteKey(b.bytes.clone())
    case o => o
  }

  override def update(
      buf: mutable.HashMap[Any, Long], input: org.apache.spark.sql.catalyst.InternalRow): mutable.HashMap[Any, Long] = {
    val raw = child.eval(input)
    if (raw != null) {
      val v = keyOf(raw)
      buf.get(v) match {
        case Some(c) => buf.update(v, c + 1) // existing stored key retained
        case None if buf.size < m => buf.update(owned(v), 1L)
        case None =>
          // Classic MG step: the arriving item annihilates one unit of
          // every counter (itself included); zeros drop out.
          val dead = mutable.ArrayBuffer.empty[Any]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1
            if (c == 0) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > m) {
      // Subtract the (m+1)-th largest count from everything; at most m
      // survive and the > n/(m+1) guarantee is preserved (Agarwal et
      // al. 2012, Theorem 1).
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(m)
      val dead = mutable.ArrayBuffer.empty[Any]
      buf.keysIterator.foreach { k =>
        val c = buf(k) - cut
        if (c <= 0) dead += k else buf.update(k, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val sorted = buf.toArray.map { case (k, c) => (unwrap(k), c) }
      .sortWith { case ((i1, c1), (i2, c2)) =>
        if (c1 != c2) c1 > c2 else itemOrdering.lt(i1, i2)
      }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](item, cnt))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val proj = UnsafeProjection.create(pairSchema)
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { case (item, cnt) =>
      val u = proj(new GenericInternalRow(Array[Any](unwrap(item), cnt)))
      dos.writeInt(u.getSizeInBytes)
      u.writeToStream(dos, null)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val buf = createAggregationBuffer()
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = dis.readInt()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val rowBytes = new Array[Byte](len)
      dis.readFully(rowBytes)
      val row = new UnsafeRow(pairSchema.length)
      row.pointTo(rowBytes, len)
      // each row owns its byte array, so the item slice stays valid
      // (and UnsafeRow.getBinary already returns a fresh copy)
      buf.update(keyOf(row.get(0, child.dataType)), row.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {

  /** Value-equality wrapper for binary map keys: raw `Array[Byte]`
    * compares by reference, so counters would never merge.
    */
  private[plans] final class ByteKey(val bytes: Array[Byte]) {
    override def hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case b: ByteKey => java.util.Arrays.equals(bytes, b.bytes)
      case _ => false
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column API: `misraGries(col, m)` → array of ≤ m
    * `struct(item, cnt)` candidates containing every item with
    * frequency > n/(m+1).
    */
  def misraGries(c: Column, m: Int): Column =
    ColumnShim.column(
      MisraGries(ColumnShim.expression(c), m).toAggregateExpression())
}
