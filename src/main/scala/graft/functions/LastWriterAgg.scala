package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StructType}

/** Last-writer-wins aggregate: keeps the `payload` struct of the row with the
  * highest `seq` per group — the engine's dedup kernel.
  *
  * Why custom: the built-in `max_by`/`max(struct)` are DeclarativeAggregates
  * whose struct-typed buffers disqualify them from BOTH Tungsten
  * HashAggregate (needs fixed-width mutable buffers) and ObjectHashAggregate
  * (accepts only TypedImperativeAggregate), so Spark silently plans a
  * SortAggregate — every micro-batch pays an O(n log n) per-task sort of
  * full-width rows. This TypedImperativeAggregate keeps hash-based
  * aggregation: the buffer is (seq, UnsafeRow payload), update is a single
  * compare+copy, merge likewise, and spill serialization is the UnsafeRow's
  * own bytes. (Preference order per the build brief: built-in < custom
  * Expression < custom operator — this is the middle tier.)
  */
case class LastWriterAgg(
    payload: Expression,
    seq: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LastWriterAgg.Buffer] {

  override def children: Seq[Expression] = Seq(payload, seq)
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType

  private lazy val payloadSchema = payload.dataType.asInstanceOf[StructType]
  @transient private lazy val proj = UnsafeProjection.create(payloadSchema)

  override def createAggregationBuffer(): LastWriterAgg.Buffer =
    new LastWriterAgg.Buffer(Long.MinValue, null)

  override def update(b: LastWriterAgg.Buffer, input: InternalRow): LastWriterAgg.Buffer = {
    val s = seq.eval(input)
    if (s != null) {
      val sv = s.asInstanceOf[Long]
      if (sv > b.seq) {
        val p = payload.eval(input)
        b.seq = sv
        // A log tail delivers a key's events offset-ASCENDING, so nearly
        // every row replaces the buffered winner: copyFrom reuses the
        // buffer's backing array instead of allocating per row (per-row
        // .copy() churned gigabytes of young-gen garbage per 16M-event batch
        // and showed up directly as multi-thread CPU inflation).
        if (p == null) b.row = null
        else {
          val src = proj(p.asInstanceOf[InternalRow])
          if (b.row == null) b.row = src.copy()
          else b.row.copyFrom(src)
        }
      }
    }
    b
  }

  override def merge(b: LastWriterAgg.Buffer, o: LastWriterAgg.Buffer): LastWriterAgg.Buffer = {
    if (o.seq > b.seq) { b.seq = o.seq; b.row = o.row }
    b
  }

  override def eval(b: LastWriterAgg.Buffer): Any = b.row

  override def serialize(b: LastWriterAgg.Buffer): Array[Byte] = {
    val rowBytes = if (b.row == null) Array.emptyByteArray else b.row.getBytes
    val out = java.nio.ByteBuffer.allocate(8 + 4 + rowBytes.length)
    out.putLong(b.seq).putInt(b.row == null match { case true => -1; case false => rowBytes.length })
    out.put(rowBytes)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): LastWriterAgg.Buffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val s = in.getLong
    val len = in.getInt
    if (len < 0) new LastWriterAgg.Buffer(s, null)
    else {
      val arr = new Array[Byte](len)
      in.get(arr)
      val row = new UnsafeRow(payloadSchema.size)
      row.pointTo(arr, len)
      new LastWriterAgg.Buffer(s, row)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): LastWriterAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LastWriterAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LastWriterAgg =
    copy(payload = c(0), seq = c(1))
  override def prettyName: String = "last_writer"
}

object LastWriterAgg {
  final class Buffer(var seq: Long, var row: UnsafeRow)

  /** last_writer(payloadStruct, seq) as a Column. Spark 4's Column wraps a
    * ColumnNode (Connect-compatible API); classic ExpressionUtils bridges
    * catalyst Expressions in and out on the classic (non-Connect) runtime. */
  def lastWriter(payload: Column, seq: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      LastWriterAgg(ColumnBridge.expression(payload),
        ColumnBridge.expression(seq)).toAggregateExpression())
  }
}
