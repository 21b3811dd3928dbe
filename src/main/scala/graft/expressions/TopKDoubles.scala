package graft.expressions

import java.nio.ByteBuffer

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
  *
  * Measured (tools.TopKBench, sf0.1 lineitem by l_partkey — many ~30-row
  * groups): 2.3x faster than the rank-window route; collect_list+slice
  * is ~1.4x faster HERE because whole tiny groups ship cheaply — the
  * heap aggregate's k-bounded state is the scale property (a hot key
  * with 10^6 rows ships k values, not 10^6), recorded honestly.
  */

/** k-bounded primitive min-heap — the aggregation buffer. Unboxed
  * doubles: the update path runs once per input row. All ordering goes
  * through `Double.compare` = Spark's SQL double ordering (NaN largest
  * and equal to itself), so NaN inputs rank exactly as a DESC sort
  * ranks them instead of being dropped by raw IEEE `<`. */
final class DoubleTopKHeap(val k: Int) {
  val values = new Array[Double](k)
  var size = 0
  @inline private def lt(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) < 0
  def add(v: Double): Unit = {
    if (size < k) {
      values(size) = v; size += 1
      var i = size - 1 // sift up
      while (i > 0 && lt(values(i), values((i - 1) / 2))) {
        val p = (i - 1) / 2
        val t = values(p); values(p) = values(i); values(i) = t
        i = p
      }
    } else if (lt(values(0), v)) {
      values(0) = v
      var i = 0 // sift down
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && lt(values(l), values(m))) m = l
        if (r < size && lt(values(r), values(m))) m = r
        if (m == i) continue = false
        else {
          val t = values(m); values(m) = values(i); values(i) = t
          i = m
        }
      }
    }
  }
}
case class TopKDoubles(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleTopKHeap] {

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

  override def createAggregationBuffer(): DoubleTopKHeap = new DoubleTopKHeap(k)

  override def update(heap: DoubleTopKHeap, input: InternalRow): DoubleTopKHeap = {
    val v = child.eval(input)
    if (v != null) heap.add(v.asInstanceOf[Double])
    heap
  }

  override def merge(heap: DoubleTopKHeap, other: DoubleTopKHeap): DoubleTopKHeap = {
    var i = 0
    while (i < other.size) { heap.add(other.values(i)); i += 1 }
    heap
  }

  override def eval(heap: DoubleTopKHeap): Any = {
    val arr = java.util.Arrays.copyOf(heap.values, heap.size)
    java.util.Arrays.sort(arr)
    // ascending -> reverse in place for DESC output
    var i = 0; var j = arr.length - 1
    while (i < j) { val t = arr(i); arr(i) = arr(j); arr(j) = t; i += 1; j -= 1 }
    new GenericArrayData(arr)
  }

  override def serialize(heap: DoubleTopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * heap.size)
    var i = 0
    while (i < heap.size) { bb.putDouble(heap.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleTopKHeap = {
    val heap = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) heap.add(bb.getDouble)
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
