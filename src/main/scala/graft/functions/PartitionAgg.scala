package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, MapType}

/** Tiny zero-allocation int→long map (linear probe over parallel arrays):
  * key cardinality here is the log-partition count (tens), and the generic
  * Scala maps box BOTH sides — at 16M rows × 2 metrics that was hundreds of
  * MB of young-gen churn per batch, measured directly as GC contention at
  * high thread counts. */
final class SmallIntLongMap(var keys: Array[Int], var vals: Array[Long], var n: Int) {
  def this() = this(new Array[Int](8), new Array[Long](8), 0)
  def update(k: Int, v: Long, isMax: Boolean): Unit = {
    var i = 0
    while (i < n) {
      if (keys(i) == k) {
        vals(i) = if (isMax) math.max(vals(i), v) else vals(i) + v
        return
      }
      i += 1
    }
    if (n == keys.length) {
      keys = java.util.Arrays.copyOf(keys, n * 2)
      vals = java.util.Arrays.copyOf(vals, n * 2)
    }
    keys(n) = k; vals(n) = v; n += 1
  }
  def foreachEntry(f: (Int, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(keys(i), vals(i)); i += 1 }
  }
}

/** Grouped long aggregate as ONE global aggregation: `key → max(value)` or
  * `key → sum(value)` over the whole input, evaluated to a map.
  *
  * Why: the per-batch offset fence (log partition → max offset) and
  * per-partition row counts are PER-GROUP statistics, but a groupBy would be
  * its own job + shuffle. As a TypedImperativeAggregate they ride
  * `Dataset.observe` on the merge job's own scan — the initial-load path
  * then needs NO separate stats pass at all (one full scan per batch saved,
  * which at 16M events is ~30% of wall-clock and the same share of DRAM
  * traffic — the resource the scaling rule stresses).
  *
  * Key cardinality = number of log partitions (small by construction).
  */
case class PartitionLongAgg(
    key: Expression,
    value: Expression,
    isMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SmallIntLongMap] {

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(IntegerType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): SmallIntLongMap = new SmallIntLongMap()

  // zero-boxing fast path: after binding, plain column children are
  // BoundReferences (and constants Literals) — read primitives directly
  // instead of Expression.eval's boxed Any (2 boxes × 16M rows per metric)
  @transient private lazy val keyOrd: Int = key match {
    case b: BoundReference if b.dataType == IntegerType => b.ordinal
    case _ => -1
  }
  @transient private lazy val valOrd: Int = value match {
    case b: BoundReference if b.dataType == LongType => b.ordinal
    case _ => -1
  }
  @transient private lazy val valConst: java.lang.Long = value match {
    case Literal(v: Long, LongType) => v
    case _ => null
  }

  override def update(b: SmallIntLongMap, input: InternalRow): SmallIntLongMap = {
    if (keyOrd >= 0) {
      if (!input.isNullAt(keyOrd)) {
        val ki = input.getInt(keyOrd)
        if (valConst != null) b.update(ki, valConst.longValue(), isMax)
        else if (valOrd >= 0) {
          if (!input.isNullAt(valOrd)) b.update(ki, input.getLong(valOrd), isMax)
        } else {
          val v = value.eval(input)
          if (v != null) b.update(ki, v.asInstanceOf[Long], isMax)
        }
      }
    } else {
      val k = key.eval(input)
      val v = value.eval(input)
      if (k != null && v != null) b.update(k.asInstanceOf[Int], v.asInstanceOf[Long], isMax)
    }
    b
  }

  override def merge(b: SmallIntLongMap, o: SmallIntLongMap): SmallIntLongMap = {
    o.foreachEntry((k, v) => b.update(k, v, isMax))
    b
  }

  override def eval(b: SmallIntLongMap): Any = {
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    b.foreachEntry((k, v) => pairs += (k -> v))
    val sorted = pairs.sortBy(_._1)
    ArrayBasedMapData(sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  override def serialize(b: SmallIntLongMap): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + b.n * 12)
    out.putInt(b.n)
    b.foreachEntry((k, v) => { out.putInt(k).putLong(v); () })
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): SmallIntLongMap = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val b = new SmallIntLongMap()
    var i = 0
    while (i < n) { b.update(in.getInt, in.getLong, isMax); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): PartitionLongAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PartitionLongAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): PartitionLongAgg =
    copy(key = c(0), value = c(1))
  override def prettyName: String = if (isMax) "partition_max" else "partition_sum"
}

object PartitionLongAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def partitionMax(key: Column, value: Column): Column =
    ColumnBridge.column(PartitionLongAgg(ColumnBridge.expression(key),
      ColumnBridge.expression(value), isMax = true).toAggregateExpression())

  def partitionSum(key: Column, value: Column): Column =
    ColumnBridge.column(PartitionLongAgg(ColumnBridge.expression(key),
      ColumnBridge.expression(value), isMax = false).toAggregateExpression())

  /** read a map<int,long> metric out of an Observation result. */
  def metricMap(v: Any): Map[Int, Long] = v match {
    case null => Map.empty
    case m: Map[_, _] => m.map { case (k, x) => k.asInstanceOf[Int] -> longOf(x) }
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => k.asInstanceOf[Int] -> longOf(x) }.toMap
    case other => throw new IllegalStateException(s"unexpected metric map: $other")
  }

  private def longOf(x: Any): Long = x match {
    case l: Long => l
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
  }
}
