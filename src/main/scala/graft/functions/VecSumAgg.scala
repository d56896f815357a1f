package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-dimension fixed-point sum of a vector column: row count `n` plus, for
  * each dimension i < dims, Σ round(v(i) · 1e6) as a LONG — the Lloyd-mean
  * statistic of [[AnnSearch.lloydCentroids]] as ONE aggregate column.
  *
  * The previous formulation spelled this as `dims` separate
  * `sum(round(element_at(v, i+1) * 1e6) as long)` aggregate columns; the
  * O(dims) expression tree was re-analyzed and re-planned on EVERY Lloyd
  * iteration (~0.3 s of driver time per iteration at D=64, growing with D).
  * This aggregate keeps the plan O(1) in the dimension count.
  *
  * Bit-exactness contract (the DuckDB oracle re-derives identical centroids):
  * each element is rounded exactly as Spark's `round()` on a double —
  * `java.math.BigDecimal.valueOf(x).setScale(0, HALF_UP)` — and summed as
  * longs, which commute, so the result is independent of row order. Nulls:
  * a null element — or a dimension beyond the vector's length (the
  * `try_element_at` rule; plain element_at would raise there under Spark 4,
  * and corpora are uniform-dim in practice) — contributes nothing to that
  * dimension's sum; a null vector still counts toward `n` (it was
  * `count(lit(1))`). Parity pinned by KernelParitySpec.
  */
case class VecSumAgg(
    vec: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[VecSumAgg.Buf] {

  require(dims > 0, s"VecSumAgg: dims must be positive, got $dims")

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = VecSumAgg.OutType

  // lazy: the first instance is built over an UNRESOLVED column (dataType
  // not yet known); only the post-analysis copy evaluates this
  private lazy val elemIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"VecSumAgg expects array<float|double>, got $other")
  }

  override def createAggregationBuffer(): VecSumAgg.Buf = new VecSumAgg.Buf(dims)

  override def update(b: VecSumAgg.Buf, input: InternalRow): VecSumAgg.Buf = {
    b.n += 1L
    val a = vec.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      val m = math.min(arr.numElements(), dims)
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) {
          val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          b.sums(i) += java.math.BigDecimal.valueOf(x * 1e6)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
        }
        i += 1
      }
    }
    b
  }

  override def merge(b: VecSumAgg.Buf, o: VecSumAgg.Buf): VecSumAgg.Buf = {
    b.n += o.n
    var i = 0
    while (i < dims) { b.sums(i) += o.sums(i); i += 1 }
    b
  }

  override def eval(b: VecSumAgg.Buf): Any =
    InternalRow(b.n, new GenericArrayData(b.sums.map(Long.box)))

  override def serialize(b: VecSumAgg.Buf): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + 8 * dims)
    out.putLong(b.n)
    var i = 0
    while (i < dims) { out.putLong(b.sums(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumAgg.Buf = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val b = new VecSumAgg.Buf(dims)
    b.n = in.getLong
    var i = 0
    while (i < dims) { b.sums(i) = in.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecSumAgg =
    copy(vec = c(0))
  override def prettyName: String = "vec_fixed_sum"
}

object VecSumAgg {

  val OutType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false)))

  final class Buf(dims: Int) {
    var n: Long = 0L
    val sums = new Array[Long](dims)
  }

  /** vec_fixed_sum(vec, dims) as a Column. */
  def vecSum(vec: Column, dims: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      VecSumAgg(ColumnBridge.expression(vec), dims).toAggregateExpression())
  }
}
