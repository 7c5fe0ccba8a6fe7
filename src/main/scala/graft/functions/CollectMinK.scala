package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded min-k collect: `collect_min_k(e, k)` returns the k
  * smallest values of `e` in ascending order — the result (and the
  * per-group ORDER) is exactly `slice(sort_array(collect_list(e)), 1,
  * k)`, but the aggregation buffer holds AT MOST k elements at every
  * point of the partial/final aggregation.
  *
  * Why it exists: LSH-style candidate generation caps bucket fan-out
  * by collecting a bucket's members and dropping buckets larger than
  * the cap. `slice(sort_array(collect_list(...)))` gets the right
  * ANSWER but materializes the full bucket in one reducer's buffer
  * before slicing — a degenerate hot bucket at web scale (one band
  * value shared by millions of docs) OOMs that reducer. Here the
  * buffer is a size-k max-heap: a hot key costs k slots, never |bucket|.
  *
  * Buffer: max-heap of size ≤ k (head = current k-th smallest);
  * insert is O(log k) and only when the value beats the head. Merge
  * folds one heap into the other under the same bound. Any orderable
  * type works (longs, strings, structs) with the same interpreted
  * ordering `sort_array` uses, so results are bit-identical to the
  * unbounded form. Null inputs are skipped (collect_list semantics).
  */
case class CollectMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Any]] {

  require(k > 0, "collect_min_k requires k > 0")

  override def prettyName: String = "collect_min_k"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    // reversed ordering: head is the LARGEST retained value, i.e. the
    // one a smaller incoming value evicts
    new java.util.PriorityQueue[Any](k, ordering.reverse)

  private def boundedAdd(heap: java.util.PriorityQueue[Any], v: Any): Unit =
    if (heap.size < k) heap.add(v)
    else if (ordering.lt(v, heap.peek)) { heap.poll(); heap.add(v) }

  override def update(heap: java.util.PriorityQueue[Any], input: InternalRow)
      : java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    // copy: mutable rows (structs) are reused by the caller's iterator
    if (v != null) boundedAdd(heap, InternalRow.copyValue(v))
    heap
  }

  override def merge(heap: java.util.PriorityQueue[Any], other: java.util.PriorityQueue[Any])
      : java.util.PriorityQueue[Any] = {
    val it = other.iterator()
    while (it.hasNext) boundedAdd(heap, it.next())
    heap
  }

  override def eval(heap: java.util.PriorityQueue[Any]): Any = {
    val arr = heap.toArray
    java.util.Arrays.sort(arr, ordering.asInstanceOf[Ordering[AnyRef]]
      .asInstanceOf[java.util.Comparator[AnyRef]])
    new GenericArrayData(arr)
  }

  // element-wise UnsafeRow framing (the same scheme Spark's Collect
  // aggregates use): length-prefixed rows, -1 terminator
  override def serialize(heap: java.util.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val proj = UnsafeProjection.create(Array[DataType](child.dataType))
    val buf = new Array[Byte](4096)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    val it = heap.iterator()
    while (it.hasNext) {
      row.update(0, it.next())
      val unsafe = proj.apply(row)
      out.writeInt(unsafe.getSizeInBytes)
      unsafe.writeToStream(out, buf)
    }
    out.writeInt(-1)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val heap = createAggregationBuffer()
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    var size = in.readInt()
    while (size >= 0) {
      val bs = new Array[Byte](size)
      in.readFully(bs)
      val row = new UnsafeRow(1)
      row.pointTo(bs, size)
      heap.add(InternalRow.copyValue(row.get(0, child.dataType)))
      size = in.readInt()
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression])
      : CollectMinK = copy(child = newChildren.head)
}
