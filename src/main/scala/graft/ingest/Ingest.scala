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
  */
object Ingest {

  final case class IngestConfig(
      filter: FilterChain = FilterChain.passAll,
      salt: Int = 1,
      /** dedup via explicit two-phase salted aggregation instead of relying
        * on max_by partial aggregation */
      saltedDedup: Int = 0)

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

    val cached = batch.persist()
    try {
      val total = cached.count()

      // 1. offset fence: drop rows already applied into the table
      //    (exactly-once under replay; reference gap SURVEY §4.3.1).
      val fenceCol =
        if (snap0.fence.isEmpty) lit(-1L)
        else coalesce(element_at(typedLit(snap0.fence), col("partition")), lit(-1L))
      val unfenced = cached.filter(col("offset") > fenceCol)

      // 2. validation split (dead letters never stop the stream).
      val deadLetters = Validate.deadLetters(unfenced)
      val dlCount = appendDeadLetters(table, deadLetters, batchId)
      val valid = Validate.valid(unfenced)

      // 3. user filter chain — row events only; DDL is control-plane and is
      //    routed, not filtered (reference pushes DDL straight to rules,
      //    /root/reference/cobra/handler.go:125-127).
      val rowEvents = valid.filter(col("op") =!= Ops.Ddl).filter(cfg.filter.expr)
      val ddlEvents = valid.filter(col("op") === Ops.Ddl)

      val rows = rowEvents.persist()
      val rowCount = rows.count()
      val unfencedCount = unfenced.count()
      val filteredOut = unfencedCount - dlCount - rowCount // minus ddl below

      // 4. DDL barriers: tiny by construction — collect and sort.
      val ddls: Array[(Long, Row)] = ddlEvents
        .select(col("seq"), col("ddl"))
        .collect()
        .map(r => (r.getLong(0), r.getStruct(1)))
        .sortBy(_._1)

      // per-partition high-water marks of everything this batch consumed
      // (fenced rows included — they are already at-or-below the fence).
      val fenceDelta: Map[Int, Long] = cached
        .groupBy(col("partition")).agg(max(col("offset")).as("mo"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

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

      if (ddls.isEmpty) {
        mergeSegment(rows, fenceDelta, isLast = true)
      } else {
        var lower = Long.MinValue
        ddls.zipWithIndex.foreach { case ((ddlSeq, ddl), _) =>
          val seg = rows.filter(col("seq") > lower && col("seq") < ddlSeq)
          mergeSegment(seg, Map.empty, isLast = false)
          applyDdl(table, ddl)
          lower = ddlSeq
        }
        mergeSegment(rows.filter(col("seq") > lower), fenceDelta, isLast = true)
      }

      val snap1 = table.snapshot
      val bm = BatchMetrics(batchId, total, dlCount, math.max(filteredOut - ddls.length, 0),
        total - unfencedCount, applied, tombstones, conflicts, ddls.length, snap1.version)
      appendLineage(table, bm, fenceDelta, rows)
      rows.unpersist()
      bm
    } finally cached.unpersist()
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

  private def appendDeadLetters(table: LakeTable, dl: DataFrame, batchId: Long): Long = {
    val cnt = dl.count()
    if (cnt > 0) {
      dl.withColumn("_batchId", lit(batchId))
        .write.mode(SaveMode.Append).parquet(s"${table.dir}/_errors")
    }
    cnt
  }

  private def appendDeadLetterNote(table: LakeTable, msg: String): Unit = {
    val spark = table.spark
    import spark.implicits._
    Seq(msg).toDF("_error").withColumn("_batchId", lit(-1L))
      .write.mode(SaveMode.Append).parquet(s"${table.dir}/_errors_notes")
  }

  private def appendLineage(
      table: LakeTable, bm: BatchMetrics, fenceDelta: Map[Int, Long], rows: DataFrame): Unit = {
    val spark = table.spark
    val perPart: Map[Int, Long] = rows.groupBy(col("partition")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val data: Seq[Row] =
      Row(bm.batchId, bm.snapshotVersion, -1, -1L, bm.eventsSeen, bm.eventsApplied,
        bm.tombstonesWritten, bm.conflictsLww, bm.deadLetters) +:
      fenceDelta.toSeq.sortBy(_._1).map { case (p, mo) =>
        Row(bm.batchId, bm.snapshotVersion, p, mo, perPart.getOrElse(p, 0L),
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
