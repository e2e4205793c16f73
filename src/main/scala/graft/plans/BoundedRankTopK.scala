package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, GenericInternalRow, InterpretedOrdering, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructField, StructType}

/** Mutable aggregation state for [[BoundedRankTopK]]: rows grouped by
  * their ORDER BY key prefix, groups kept in key order. `totalRows`
  * tracks the retained row count so the rank-semantics trim
  * (`rows-before >= k` drops the tail group) is O(1) per check.
  */
final class RankTopKBuffer(keyOrdering: Ordering[InternalRow]) {
  val groups: mutable.TreeMap[InternalRow, mutable.ArrayBuffer[InternalRow]] =
    mutable.TreeMap.empty(keyOrdering)
  var totalRows: Int = 0
}

/** Bounded `rank()`/`dense_rank() <= k` aggregate — the tie-aware
  * sibling of [[BoundedTopK]].
  *
  * `row_number() <= k` keeps exactly k rows per group, so a k-row heap
  * suffices. `rank() <= k` keeps every row TIED with the k-th (rank =
  * rows-strictly-before + 1, shared by the whole tie group), and
  * `dense_rank() <= k` keeps every row of the k smallest distinct key
  * values — so the correct bound is not k rows but k *key groups* (and
  * for rank, only as many groups as fit under k cumulative rows).
  * This aggregate keeps rows grouped by their ORDER BY key prefix
  * (struct fields `[0, keyCount)`), trims whole tail groups the moment
  * the retention rule excludes them, and emits each surviving row with
  * its final rank precomputed:
  *
  *   - rank:       group kept iff rows-in-smaller-groups < k; a row's
  *                 rank is that count + 1 (ties share it);
  *   - dense_rank: the k smallest groups are kept; a row's rank is the
  *                 group's 1-based position.
  *
  * Buffer size is the size of the answer itself — ≤ k-1 rows plus the
  * boundary tie group (rank) or the k groups' rows (dense_rank) — per
  * (group, map task); any correct plan for the same filter must retain
  * those rows, and the window plan retains strictly more. Comparisons
  * use the same Catalyst [[SortOrder]] machinery as a window sort
  * (per-field direction via `descFields`, null placement via
  * `nullsLastFields` — direction default when absent), so NaN, -0.0,
  * nulls and integral extremes rank exactly as ORDER BY would.
  *
  * Output: array of `struct(r, k0.., p0..)` sorted by key then full
  * row; `explode` + `GetStructField(0)` restores the rank column.
  */
case class BoundedRankTopK(
    child: Expression,
    k: Int,
    keyCount: Int,
    dense: Boolean,
    descFields: Seq[Boolean] = Nil,
    nullsLastFields: Seq[Boolean] = Nil,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RankTopKBuffer] {

  require(k > 0, s"bounded_rank_top_k requires k > 0, got $k")

  private lazy val childSchema: StructType = child.dataType.asInstanceOf[StructType]

  require(keyCount >= 1,
    s"bounded_rank_top_k requires at least one sort-key field, got $keyCount")

  private def fieldOrders(n: Int): Seq[SortOrder] =
    childSchema.take(n).zipWithIndex.map { case (f, i) =>
      val desc = i < descFields.length && descFields(i)
      val nullsLast =
        if (i < nullsLastFields.length) nullsLastFields(i) else desc
      SortOrder(
        BoundReference(i, f.dataType, f.nullable),
        if (desc) Descending else Ascending,
        if (nullsLast) NullsLast else NullsFirst,
        Seq.empty)
    }.toSeq

  // Key-prefix order decides rank; the full-row order only fixes a
  // deterministic output order among tied rows.
  private lazy val keyOrdering: Ordering[InternalRow] =
    new InterpretedOrdering(fieldOrders(keyCount))
  private lazy val rowOrdering: Ordering[InternalRow] =
    new InterpretedOrdering(fieldOrders(childSchema.length))

  lazy val outputSchema: StructType =
    StructType(StructField("r", IntegerType, nullable = false) +: childSchema.fields)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(outputSchema, containsNull = false)
  override def prettyName: String = "bounded_rank_top_k"

  override def createAggregationBuffer(): RankTopKBuffer =
    new RankTopKBuffer(keyOrdering)

  private def insert(buf: RankTopKBuffer, row: InternalRow): Unit =
    buf.groups.get(row) match {
      case Some(rows) =>
        // The group is currently kept, so the new tied row is too; but
        // under rank semantics its arrival can push tail groups past k
        // cumulative predecessors.
        rows += row
        buf.totalRows += 1
        if (!dense) trim(buf)
      case None =>
        // Fast reject: a NEW key beyond the current last kept key, with
        // retention already full, lands strictly outside the top-k.
        val reject = buf.groups.nonEmpty &&
          keyOrdering.compare(row, buf.groups.lastKey) > 0 &&
          (if (dense) buf.groups.size >= k else buf.totalRows >= k)
        if (!reject) {
          buf.groups.put(row, mutable.ArrayBuffer(row))
          buf.totalRows += 1
          trim(buf)
        }
    }

  private def trim(buf: RankTopKBuffer): Unit = {
    if (dense) {
      while (buf.groups.size > k) {
        val (key, rows) = buf.groups.last
        buf.groups.remove(key)
        buf.totalRows -= rows.size
      }
    } else {
      // Last group's rank is (totalRows - lastSize) + 1; drop it while
      // that exceeds k. The first group always stays (rank 1).
      var go = buf.groups.size > 1
      while (go) {
        val (key, rows) = buf.groups.last
        if (buf.totalRows - rows.size >= k) {
          buf.groups.remove(key)
          buf.totalRows -= rows.size
          go = buf.groups.size > 1
        } else go = false
      }
    }
  }

  override def update(buf: RankTopKBuffer, input: InternalRow): RankTopKBuffer = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(buf: RankTopKBuffer, other: RankTopKBuffer): RankTopKBuffer = {
    other.groups.valuesIterator.foreach(_.foreach(insert(buf, _)))
    buf
  }

  override def eval(buf: RankTopKBuffer): Any = {
    val out = mutable.ArrayBuffer.empty[Any]
    var r = 1
    buf.groups.valuesIterator.foreach { rows =>
      rows.sorted(rowOrdering).foreach { row =>
        val vals = new Array[Any](childSchema.length + 1)
        vals(0) = r
        var i = 0
        while (i < childSchema.length) {
          vals(i + 1) = row.get(i, childSchema(i).dataType)
          i += 1
        }
        out += new GenericInternalRow(vals)
      }
      r += (if (dense) 1 else rows.size)
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: RankTopKBuffer): Array[Byte] = {
    val proj = UnsafeProjection.create(childSchema)
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.totalRows)
    buf.groups.valuesIterator.foreach(_.foreach { row =>
      val u = proj(row)
      dos.writeInt(u.getSizeInBytes)
      u.writeToStream(dos, null)
    })
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RankTopKBuffer = {
    val buf = createAggregationBuffer()
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = dis.readInt()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val rowBytes = new Array[Byte](len)
      dis.readFully(rowBytes)
      val row = new UnsafeRow(childSchema.length)
      row.pointTo(rowBytes, len)
      insert(buf, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedRankTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedRankTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedRankTopK =
    copy(child = newChildren.head)
}

object BoundedRankTopK {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column API: `boundedRankTopK(struct(sortKeys..., payload...), k,
    * keyCount)` → array of `struct(r, keys..., payload...)` holding
    * every row with rank (`dense = false`) or dense_rank (`true`)
    * ≤ k, rank precomputed as field `r`. `descFields` /
    * `nullsLastFields` give each key field its direction and null
    * placement (direction default when absent).
    */
  def boundedRankTopK(c: Column, k: Int, keyCount: Int,
      dense: Boolean = false, descFields: Seq[Boolean] = Nil,
      nullsLastFields: Seq[Boolean] = Nil): Column =
    ColumnShim.column(
      BoundedRankTopK(ColumnShim.expression(c), k, keyCount, dense,
        descFields, nullsLastFields)
        .toAggregateExpression())
}
