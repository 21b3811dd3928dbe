package graft.expressions

import java.nio.ByteBuffer
import java.util.PriorityQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native bounded TOP-K aggregate (`topk(col, k)`) — a
  * `TypedImperativeAggregate` carrying a k-bounded min-heap, the custom
  * AGGREGATE tier of the SURVEY §4.2 ladder (the scalar tier is
  * vec_dot/vec_dot_i8).
  *
  * Why custom: Spark has no bounded per-group top-k aggregate. The
  * built-in routes are `collect_list` + `sort_array` + `slice` — which
  * shuffles EVERY row of every group and holds whole groups in memory —
  * or a rank window + filter, which sorts every group end-to-end
  * (`WindowGroupLimit` prunes map-side but still range-shuffles the
  * survivors). This aggregate's state is ≤ k doubles per group at every
  * stage: partial aggregation bounds both the shuffle (k values per
  * group per task) and memory (k-element heap), the exact property that
  * keeps per-group top-k viable on 100 TB fact tables.
  *
  * Semantics: top k input values DESCENDING (duplicates kept), NULLs
  * skipped, groups with no non-null input yield an empty array. The
  * result is value-deterministic (equal values are interchangeable), so
  * exploded (rank, value) rows exact-match a `row_number` oracle.
  */
case class TopKDoubles(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[java.lang.Double]] {

  require(k > 0, s"topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk requires a DOUBLE column, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk"

  override def createAggregationBuffer(): PriorityQueue[java.lang.Double] =
    new PriorityQueue[java.lang.Double](k + 1)

  private def add(heap: PriorityQueue[java.lang.Double], v: Double): Unit = {
    if (heap.size < k) heap.add(v)
    else if (heap.peek() < v) { heap.poll(); heap.add(v) }
  }

  override def update(
      heap: PriorityQueue[java.lang.Double], input: InternalRow): PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) add(heap, v.asInstanceOf[Double])
    heap
  }

  override def merge(
      heap: PriorityQueue[java.lang.Double],
      other: PriorityQueue[java.lang.Double]): PriorityQueue[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) add(heap, it.next())
    heap
  }

  override def eval(heap: PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](heap.size)
    var i = heap.size - 1
    while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // min-heap drains ascending
    new GenericArrayData(arr)
  }

  override def serialize(heap: PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * heap.size)
    val it = heap.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[java.lang.Double] = {
    val heap = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) add(heap, bb.getDouble)
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKDoubles =
    copy(child = newChildren.head)
}

object TopKDoubles {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  /** Column entry point: `topK(col, 5)`. The k argument must be a
    * literal — it sizes the per-group heap at plan time. */
  def topK(c: Column, k: Int): Column =
    call_function("topk", c, org.apache.spark.sql.functions.lit(k))

  private[graft] val builder: Seq[Expression] => Expression = {
    case Seq(c, Literal(k: Int, IntegerType)) => TopKDoubles(c, k)
    case other => throw new IllegalArgumentException(
      "topk expects (column, integer-literal k), got " + other.mkString(", "))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk", builder, "built-in")
}
