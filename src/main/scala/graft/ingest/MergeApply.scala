package graft.ingest

import graft.lake.{BucketFile, LakeTable, TableSchema}
import graft.model.Ops
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-oriented MERGE INTO over the LakeTable — the engine's replacement for
  * the reference's per-row SQL rendering (`sqlMaker`,
  * /root/reference/event/sql_maker.go:28-188). Semantics per SURVEY §2.4:
  *
  * {{{
  * MERGE INTO repos USING delta ON key
  *   WHEN MATCHED AND delta.op = 'delete' AND delta.seq > repos._seq THEN tombstone
  *   WHEN MATCHED AND delta.seq > repos._seq THEN UPDATE SET <after-image cols>
  *   WHEN NOT MATCHED THEN INSERT (delete ⇒ tombstone, so stale replays can
  *                                 never resurrect the row)
  * }}}
  *
  * The delta must be pre-deduped to one row per (repo, path) (Dedup).
  * Schema columns NOT carried by the after-image (added later by DDL) are
  * preserved from the current row on update — the reference's
  * "UPDATE SET only changed fields" semantics
  * (/root/reference/event/sql_maker.go:161-177).
  *
  * Copy-on-write at bucket granularity: only buckets containing delta keys
  * are read and rewritten; the snapshot commit swaps them atomically.
  */
object MergeApply {

  private val prof = sys.env.contains("GRAFT_PROF")
  private def timed[T](name: String)(f: => T): T =
    if (!prof) f else {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof-merge] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

  final case class MergeResult(
      eventsApplied: Long,
      upserts: Long,
      tombstonesWritten: Long,
      conflictsLww: Long,
      duplicatesIgnored: Long,
      affectedBuckets: Int)

  /** @param delta  one row per key: (repo, path, op, seq, after:struct)
    * @param fenceDelta per-log-partition max offsets covered by this delta's
    *                   source batch — committed atomically with the data
    * @param salt   >1 spreads each rewritten bucket's write work across
    *               `salt` tasks (hot-bucket write skew)
    */
  def merge(
      table: LakeTable,
      delta: DataFrame,
      fenceDelta: Map[Int, Long],
      batchId: Long = -1L,
      salt: Int = 1,
      extraMetrics: Map[String, Long] = Map.empty): MergeResult = {
    val spark = table.spark
    val snap = table.snapshot
    val sch = snap.schema

    // the deduped delta feeds three actions (bucket discovery, metrics join,
    // merge join) — persist it so the dedup shuffle runs once
    val deltaP = delta.persist()
    try mergeImpl(table, deltaP, fenceDelta, batchId, salt, extraMetrics)
    finally deltaP.unpersist()
  }

  private def mergeImpl(
      table: LakeTable,
      delta: DataFrame,
      fenceDelta: Map[Int, Long],
      batchId: Long,
      salt: Int,
      extraMetrics: Map[String, Long]): MergeResult = {
    val spark = table.spark
    val snap = table.snapshot
    val sch = snap.schema

    val dB = delta.withColumn("_bucket", table.bucketExpr(col("repo"), col("path")))
    val affected: Set[Int] = timed("affected-buckets")(
      dB.select("_bucket").distinct().collect().map(_.getInt(0)).toSet)

    if (affected.isEmpty) {
      // Nothing to apply — still advance the fence/lineage atomically.
      table.commit(Set.empty, Seq.empty, fenceDelta,
        extraMetrics + ("batches" -> 1L), batchId)
      return MergeResult(0, 0, 0, 0, 0, 0)
    }

    val base = table.readInternal(snap, affected)

    // ---- lineage metrics (narrow columns only: parquet-pruned read) ----
    val baseKeys = base.select(col("repo"), col("path"), col(LakeTable.SeqCol))
    val win = col(LakeTable.SeqCol).isNull || (col("seq") > col(LakeTable.SeqCol))
    val dup = col("seq") === col(LakeTable.SeqCol) // exact re-delivery (LWW tie)
    val mrow = timed("metrics-join")(delta.select(col("repo"), col("path"), col("op"), col("seq"))
      .join(baseKeys, Seq("repo", "path"), "left")
      .agg(
        sum(when(win, 1L).otherwise(0L)).as("applied"),
        sum(when(win && col("op") === Ops.Delete, 1L).otherwise(0L)).as("tombstones"),
        sum(when(win && col("op") =!= Ops.Delete, 1L).otherwise(0L)).as("upserts"),
        sum(when(!win && !dup, 1L).otherwise(0L)).as("conflicts"),
        sum(when(dup, 1L).otherwise(0L)).as("duplicates"))
      .collect()(0))
    def m(i: Int): Long = if (mrow.isNullAt(i)) 0L else mrow.getLong(i)
    val (applied, tombstones, upserts, conflicts, duplicates) = (m(0), m(1), m(2), m(3), m(4))

    // ---- the merge itself ----
    val afterFields: Set[String] = delta.schema("after").dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSet
      case _ => Set.empty
    }
    val b = base.alias("b")
    val d = delta.alias("d")
    val joined = b.join(d,
      col("b.repo") === col("d.repo") && col("b.path") === col("d.path"), "full_outer")

    val dWins = col("d.seq").isNotNull &&
      (col(s"b.${LakeTable.SeqCol}").isNull || col("d.seq") > col(s"b.${LakeTable.SeqCol}"))
    val isDel = col("d.op") === Ops.Delete

    val outCols = sch.columns.map { c =>
      val tp = TableSchema.toSpark(c.dataType)
      if (c.name == "repo" || c.name == "path")
        coalesce(col(s"d.${c.name}"), col(s"b.${c.name}")).as(c.name)
      else if (afterFields.contains(c.name))
        when(dWins && !isDel, col(s"d.after.${c.name}").cast(tp))
          .when(dWins && isDel, lit(null).cast(tp))
          .otherwise(col(s"b.${c.name}")).as(c.name)
      else // schema column not carried by the image: preserve current value
        when(dWins && isDel, lit(null).cast(tp))
          .otherwise(col(s"b.${c.name}")).as(c.name)
    } ++ Seq(
      when(dWins, col("d.seq")).otherwise(col(s"b.${LakeTable.SeqCol}")).as(LakeTable.SeqCol),
      when(dWins, isDel).otherwise(col(s"b.${LakeTable.DeletedCol}")).as(LakeTable.DeletedCol))

    val merged = joined.select(outCols: _*)
      .withColumn("_bucket", table.bucketExpr(col("repo"), col("path")))

    // Route each rewritten bucket to (ideally) one task; salt spreads a hot
    // bucket's write across `salt` tasks (files per bucket dir stay correct —
    // the dir is the commit unit).
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val writeParts = math.max(1, math.min(affected.size * math.max(salt, 1), shufflePartitions))
    val routed =
      if (salt > 1)
        merged.repartition(writeParts, col("_bucket"), pmod(hash(col("path")), lit(salt)))
      else
        merged.repartition(writeParts, col("_bucket"))

    val commitDir = table.newCommitDataDir()
    timed("join+write")(
      routed.write.mode("overwrite").partitionBy("_bucket").parquet(commitDir))

    val newBuckets: Seq[BucketFile] =
      timed("footer-list")(table.listWrittenBuckets(commitDir, sch.schemaId))
    val metricsDelta = Map(
      "eventsApplied" -> applied,
      "upserts" -> upserts,
      "tombstonesWritten" -> tombstones,
      "conflictsLww" -> conflicts,
      "duplicatesIgnored" -> duplicates,
      "batches" -> 1L) ++ extraMetrics
    table.commit(affected, newBuckets, fenceDelta, metricsDelta, batchId)
    MergeResult(applied, upserts, tombstones, conflicts, duplicates, affected.size)
  }
}
