package graft.ingest

import graft.lake.LakeTable
import graft.model.Ops
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-micro-batch application: the engine's `foreachBatch` body and the
  * batch-replay entry point. Mirrors the reference's event lifecycle
  * (SURVEY §3.1) set-orientedly:
  *
  *   fence-skip → validate (dead-letter side output) → filter chain →
  *   [split at DDL barriers] → dedup (last writer per key) → MERGE apply →
  *   atomic snapshot commit (data + fence + metrics together) → lineage.
  *
  * DDL ordering: the reference lets DDL overtake buffered row events
  * (/root/reference/cobra/handler.go:103-129 — a hazard, SURVEY §4.3.3).
  * Here DDL events stay in-line in the ordered log; a batch is split at each
  * DDL's `seq`, rows below it apply under the old schema, then the schema
  * evolves (a schema-only snapshot commit), then the rest applies.
  *
  * Job economy (scale note): one batch costs exactly
  *   1 stats aggregation + 1 dedup/merge pipeline + 1 metrics key-join +
  *   1 bucket write (+ tiny driver-side footer reads for file counts),
  * all distributed; no per-event driver work, no collect of event data.
  */
object Ingest {

  final case class IngestConfig(
      filter: FilterChain = FilterChain.passAll,
      salt: Int = 1,
      /** dedup via explicit two-phase salted aggregation instead of relying
        * on max_by partial aggregation */
      saltedDedup: Int = 0,
      /** Whether the source guarantees per-partition offset-ordered delivery
        * across micro-batches (a live binlog/Kafka tail, or a replay of a
        * fully-applied log). Only then may the offset fence FILTER rows —
        * with an unordered source (e.g. a bulk-written file-stream dir, where
        * mtime order is arbitrary) a later-offset batch would advance the
        * fence past events that never arrived, and filtering would lose them.
        * When false (safe default) the fence is still recorded as a
        * high-water mark and re-delivered events are neutralized by
        * last-writer-wins + tombstones instead (convergence is
        * order-independent; see ConvergencePropertySpec). */
      orderedDelivery: Boolean = false)

  final case class BatchMetrics(
      batchId: Long,
      eventsSeen: Long,
      deadLetters: Long,
      filteredOut: Long,
      skippedByFence: Long,
      eventsApplied: Long,
      tombstonesWritten: Long,
      conflictsLww: Long,
      ddlApplied: Long,
      snapshotVersion: Long)

  val lineageSchema: StructType = StructType(Seq(
    StructField("batchId", LongType),
    StructField("snapshotVersion", LongType),
    StructField("partition", IntegerType),
    StructField("maxOffset", LongType),
    StructField("eventsSeen", LongType),
    StructField("eventsApplied", LongType),
    StructField("tombstones", LongType),
    StructField("conflictsLww", LongType),
    StructField("deadLetters", LongType)))

  /** Apply one batch of change events. Idempotent under re-delivery:
    * a batchId at or below the committed one is skipped wholesale (streaming
    * retry), and per-row offsets at or below the fence are skipped (replay
    * from an older checkpoint / at-least-once source).
    */
  def applyBatch(
      table: LakeTable,
      batch: DataFrame,
      batchId: Long = -1L,
      cfg: IngestConfig = IngestConfig()): BatchMetrics = {
    val spark = table.spark
    val snap0 = table.refresh()

    if (batchId >= 0 && batchId <= snap0.committedBatchId) {
      // foreachBatch retry of an already-committed batch: exact no-op.
      return BatchMetrics(batchId, 0, 0, 0, 0, 0, 0, 0, 0, snap0.version)
    }

    // predicate pieces (pure Columns — composed into ONE stats pass)
    val fenceCol =
      if (snap0.fence.isEmpty) lit(-1L)
      else coalesce(element_at(typedLit(snap0.fence), col("partition")), lit(-1L))
    val pastFence = col("offset") > fenceCol
    // row-level fence filtering only under an ordered-delivery contract
    val unfenced = if (cfg.orderedDelivery) pastFence else lit(true)
    val err = Validate.errorExpr
    val isRowOp = col("op").isin(Ops.rowOps.toSeq: _*)
    val passes = cfg.filter.expr

    // Deliberately NOT persisting the batch: for parquet-backed micro-batches
    // a columnar cache build costs far more than the two vectorized re-scans
    // this pipeline does (one stats pass, one dedup pass) — measured 4×
    // slower with persist at 2M events.
    val cached = batch
    locally {
      // ---- single per-partition stats job (counts + high-water marks) ----
      val stats = cached.groupBy(col("partition")).agg(
        count(lit(1)).as("total"),
        max(col("offset")).as("maxOff"),
        sum(when(pastFence, 1L).otherwise(0L)).as("unfenced"),
        sum(when(unfenced && err.isNotNull, 1L).otherwise(0L)).as("dl"),
        sum(when(unfenced && err.isNull && col("op") === Ops.Ddl, 1L).otherwise(0L)).as("nddl"),
        sum(when(unfenced && err.isNull && isRowOp && passes, 1L).otherwise(0L)).as("nrows"))
        .collect()
      def sumL(i: Int): Long = stats.map(r => if (r.isNullAt(i)) 0L else r.getLong(i)).sum
      val total = sumL(1); val pastFenceN = sumL(3)
      val unfencedN = if (cfg.orderedDelivery) pastFenceN else total
      val dlCount = sumL(4); val ddlCount = sumL(5); val rowCount = sumL(6)
      val fenceDelta: Map[Int, Long] =
        stats.map(r => r.getInt(0) -> r.getLong(2)).toMap
      val perPartRows: Map[Int, Long] =
        stats.map(r => r.getInt(0) -> (if (r.isNullAt(6)) 0L else r.getLong(6))).toMap

      if (dlCount > 0) appendDeadLetters(table, cached.filter(unfenced && err.isNotNull), batchId)

      val rowEvents = cached.filter(unfenced && err.isNull && isRowOp && passes)

      var applied = 0L; var tombstones = 0L; var conflicts = 0L

      def mergeSegment(seg: DataFrame, fence: Map[Int, Long], isLast: Boolean): Unit = {
        val deduped =
          if (cfg.saltedDedup > 1) Dedup.lastWriterPerKeySalted(seg, cfg.saltedDedup)
          else Dedup.lastWriterPerKey(seg)
        val r = MergeApply.merge(table, deduped, fence,
          batchId = if (isLast) batchId else -1L, salt = cfg.salt,
          extraMetrics =
            if (isLast) Map("deadLetters" -> dlCount, "eventsSeen" -> total)
            else Map.empty)
        applied += r.eventsApplied; tombstones += r.tombstonesWritten
        conflicts += r.conflictsLww
      }

      // ---- DDL barriers (rare; collect is tiny by construction) ----
      val ddls: Array[(Long, Row)] =
        if (ddlCount == 0) Array.empty
        else cached.filter(unfenced && err.isNull && col("op") === Ops.Ddl)
          .select(col("seq"), col("ddl"))
          .collect()
          .map(r => (r.getLong(0), r.getStruct(1)))
          .sortBy(_._1)

      if (ddls.isEmpty) {
        mergeSegment(rowEvents, fenceDelta, isLast = true)
      } else {
        var lower = Long.MinValue
        ddls.foreach { case (ddlSeq, ddl) =>
          mergeSegment(rowEvents.filter(col("seq") > lower && col("seq") < ddlSeq),
            Map.empty, isLast = false)
          applyDdl(table, ddl)
          lower = ddlSeq
        }
        mergeSegment(rowEvents.filter(col("seq") > lower), fenceDelta, isLast = true)
      }

      val snap1 = table.snapshot
      val bm = BatchMetrics(batchId, total, dlCount,
        math.max(unfencedN - dlCount - ddlCount - rowCount, 0),
        total - unfencedN, applied, tombstones, conflicts, ddls.length, snap1.version)
      appendLineage(table, bm, fenceDelta, perPartRows)
      bm
    }
  }

  /** Batch replay of a whole changelog (the `Trigger.AvailableNow`-style
    * entry used by tests and the benchmark's batch mode). */
  def replayLog(table: LakeTable, log: DataFrame, cfg: IngestConfig = IngestConfig()): BatchMetrics =
    applyBatch(table, log, batchId = table.snapshot.committedBatchId + 1, cfg)

  private def applyDdl(table: LakeTable, ddl: Row): Unit = {
    def s(name: String): String = {
      val i = ddl.fieldIndex(name)
      if (ddl.isNullAt(i)) null else ddl.getString(i)
    }
    s("kind") match {
      case "add_column" => table.evolveSchema(_.addColumn(s("column"), s("toType")))
      case "rename_column" => table.evolveSchema(_.renameColumn(s("column"), s("newName")))
      case "widen_type" => table.evolveSchema(_.widenType(s("column"), s("toType")))
      case other =>
        // unknown DDL: dead-letter semantics — record, don't crash.
        appendDeadLetterNote(table, s"unknown ddl kind: $other")
    }
  }

  private def appendDeadLetters(table: LakeTable, dl: DataFrame, batchId: Long): Unit =
    dl.withColumn("_error", Validate.errorExpr)
      .withColumn("_batchId", lit(batchId))
      .write.mode(SaveMode.Append).parquet(s"${table.dir}/_errors")

  private def appendDeadLetterNote(table: LakeTable, msg: String): Unit = {
    val spark = table.spark
    import spark.implicits._
    Seq(msg).toDF("_error").withColumn("_batchId", lit(-1L))
      .write.mode(SaveMode.Append).parquet(s"${table.dir}/_errors_notes")
  }

  private def appendLineage(
      table: LakeTable, bm: BatchMetrics, fenceDelta: Map[Int, Long],
      perPartRows: Map[Int, Long]): Unit = {
    val spark = table.spark
    val data: Seq[Row] =
      Row(bm.batchId, bm.snapshotVersion, -1, -1L, bm.eventsSeen, bm.eventsApplied,
        bm.tombstonesWritten, bm.conflictsLww, bm.deadLetters) +:
      fenceDelta.toSeq.sortBy(_._1).map { case (p, mo) =>
        Row(bm.batchId, bm.snapshotVersion, p, mo, perPartRows.getOrElse(p, 0L),
          -1L, -1L, -1L, -1L)
      }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), lineageSchema)
      .write.mode(SaveMode.Append).parquet(s"${table.dir}/_lineage")
  }

  /** Read the lineage/metrics table (run-report analog,
    * /root/reference/rules/factory_http.go:50-89). */
  def lineage(table: LakeTable): DataFrame = {
    val p = java.nio.file.Paths.get(s"${table.dir}/_lineage")
    if (java.nio.file.Files.isDirectory(p))
      table.spark.read.schema(lineageSchema).parquet(p.toString)
    else
      table.spark.createDataFrame(
        java.util.Collections.emptyList[Row](), lineageSchema)
  }
}
