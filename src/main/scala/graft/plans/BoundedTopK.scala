package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k aggregate: keeps the k FIRST struct rows under a
  * per-field sort order (ascending nulls-first by default), with a ≤k
  * buffer at every stage of aggregation.
  *
  * This is the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(lowCardKey))` top-k idiom:
  * the window plan shuffles EVERY row of a group into one task and
  * sorts it there (at 100 TB a handful of segment/query-id partitions
  * each sort the whole join output), while this aggregate's partial
  * combine keeps at most k rows per map task, shuffles ≤k rows per
  * (group, partition), and never materializes or sorts a full group.
  *
  * Descending keys: `descFields(i) = true` marks struct field i as
  * descending; `nullsLastFields(i)` overrides the direction's default
  * null placement (asc→NULLS FIRST, desc→NULLS LAST) — together they
  * express all four `ASC|DESC NULLS FIRST|LAST` combinations. The
  * comparator is built from the same Catalyst [[SortOrder]] semantics
  * a window sort uses, so NaN placement, -0.0 == 0.0, and null
  * ordering agree with ORDER BY by construction — no negation, so
  * integral MIN_VALUE and Float/Double NaN are safe and any orderable
  * type (string, date, decimal…) may sort desc. Fields beyond
  * `descFields.length` (the payload, riding behind the sort keys in
  * the same struct) compare ascending as a deterministic tie-break.
  * Output is the k rows as a sorted array of structs — `posexplode`
  * yields (rank-1, row).
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    descFields: Seq[Boolean] = Nil,
    nullsLastFields: Seq[Boolean] = Nil,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"bounded_top_k requires k > 0, got $k")

  private lazy val childSchema: StructType = child.dataType.asInstanceOf[StructType]
  // Field-by-field order over the struct — the total order the caller
  // encodes in the struct's leading fields, honoring per-field
  // direction. Same SortOrder machinery as SortExec, so it agrees
  // with window ORDER BY on every edge (NaN, -0.0, nulls).
  private lazy val rowOrdering: Ordering[InternalRow] = {
    val orders = childSchema.zipWithIndex.map { case (f, i) =>
      val desc = i < descFields.length && descFields(i)
      val nullsLast =
        if (i < nullsLastFields.length) nullsLastFields(i) else desc
      SortOrder(
        BoundReference(i, f.dataType, f.nullable),
        if (desc) Descending else Ascending,
        if (nullsLast) NullsLast else NullsFirst,
        Seq.empty)
    }
    new InterpretedOrdering(orders.toSeq)
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(childSchema, containsNull = false)
  override def prettyName: String = "bounded_top_k"

  // Max-heap under the row ordering: head is the current worst of the
  // kept k, so the bound check is O(1) and eviction O(log k).
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty(rowOrdering)

  override def update(
      buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) {
        buf.enqueue(row.copy())
      } else if (rowOrdering.compare(row, buf.head) < 0) {
        buf.dequeue()
        buf.enqueue(row.copy())
      }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { row =>
      if (buf.size < k) {
        buf.enqueue(row)
      } else if (rowOrdering.compare(row, buf.head) < 0) {
        buf.dequeue()
        buf.enqueue(row)
      }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any = {
    // dequeueAll drains in priority (descending) order; reverse for the
    // ascending rank order the caller posexplodes.
    val sorted = buf.clone().dequeueAll.reverse
    new GenericArrayData(sorted.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val proj = UnsafeProjection.create(childSchema)
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { row =>
      val u = proj(row)
      dos.writeInt(u.getSizeInBytes)
      u.writeToStream(dos, null)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
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
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}

object BoundedTopK {

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column API: `boundedTopK(struct(sortKeys..., payload...), k)` →
    * array of the k first structs under the per-field order
    * (ascending nulls-first unless `descFields` / `nullsLastFields`
    * override a field's direction or null placement).
    */
  def boundedTopK(c: Column, k: Int, descFields: Seq[Boolean] = Nil,
      nullsLastFields: Seq[Boolean] = Nil): Column =
    ColumnShim.column(
      BoundedTopK(ColumnShim.expression(c), k, descFields, nullsLastFields)
        .toAggregateExpression())
}
