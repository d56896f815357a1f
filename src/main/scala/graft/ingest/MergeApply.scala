package graft.ingest

import graft.lake.{BucketFile, LakeTable, TableSchema}
import graft.model.Ops
import org.apache.spark.sql.{DataFrame, Observation}
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
  *
  * Job economy: exactly TWO jobs per merge —
  *   1. affected-bucket discovery (Catalyst prunes the dedup's max_by away,
  *      leaving distinct-over-scan on the key columns only), and
  *   2. the merge join + bucket write, with lineage metrics collected
  *      IN-FLIGHT via `Dataset.observe` (no separate metrics pass).
  * The delta is deliberately NOT cached: rebuilding it once costs far less
  * than an in-memory columnar cache build (which also anti-scales with cores
  * — measured 27s@8c vs 70s@32c for a 512k-row delta vs ~4s to recompute).
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
      extraMetrics: Map[String, Long] = Map.empty,
      affectedHint: Option[Set[Int]] = None): MergeResult = {
    val spark = table.spark
    val snap = table.snapshot
    val sch = snap.schema

    // Which buckets does this delta touch? Usually pre-computed by the
    // caller's stats pass (collect_set piggybacked on the same scan); the
    // fallback is a distinct over the delta keys (column pruning strips the
    // dedup's max_by, leaving distinct-over-scan). An over-inclusive set is
    // sound: an untouched bucket is rewritten to identical contents.
    val affected: Set[Int] = affectedHint.getOrElse(timed("affected-buckets")(
      delta.select(table.bucketExpr(col("repo"), col("path")).as("_bucket"))
        .distinct().collect().map(_.getInt(0)).toSet))

    if (affected.isEmpty) {
      // Nothing to apply — still advance the fence/lineage atomically.
      table.commit(Set.empty, Seq.empty, fenceDelta,
        extraMetrics + ("batches" -> 1L), batchId)
      return MergeResult(0, 0, 0, 0, 0, 0)
    }

    val base = table.readInternal(snap, affected)

    val afterFields: Set[String] = delta.schema("after").dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSet
      case _ => Set.empty
    }
    val b = base.alias("b")
    val d = delta.alias("d")
    val joined = b.join(d,
      col("b.repo") === col("d.repo") && col("b.path") === col("d.path"), "full_outer")

    val baseSeq = col(s"b.${LakeTable.SeqCol}")
    val dWins = col("d.seq").isNotNull && (baseSeq.isNull || col("d.seq") > baseSeq)
    val dStale = col("d.seq").isNotNull && baseSeq.isNotNull && col("d.seq") < baseSeq
    val dDup = col("d.seq").isNotNull && baseSeq.isNotNull && col("d.seq") === baseSeq
    val isDel = col("d.op") === Ops.Delete

    // no-op update detection — the reference's DiffData strips unchanged
    // fields and skips empty updates (/root/reference/config/aggregation.go:
    // 164-207); set-orientedly that's a null-safe compare of the after-image
    // against the current row, surfaced as a metric
    val imageUnchanged = afterFields
      .map(f => col(s"d.after.$f") <=> col(s"b.$f"))
      .reduceOption(_ && _).getOrElse(lit(false))

    // lineage metrics ride along with the write (no extra pass)
    val obs = Observation(s"merge-${java.util.UUID.randomUUID()}")
    val observed = joined.observe(obs,
      sum(when(dWins, 1L).otherwise(0L)).as("applied"),
      sum(when(dWins && isDel, 1L).otherwise(0L)).as("tombstones"),
      sum(when(dWins && !isDel, 1L).otherwise(0L)).as("upserts"),
      sum(when(dStale, 1L).otherwise(0L)).as("conflicts"),
      sum(when(dDup, 1L).otherwise(0L)).as("duplicates"),
      sum(when(dWins && !isDel && col(s"b.${LakeTable.SeqCol}").isNotNull &&
        imageUnchanged, 1L).otherwise(0L)).as("noopUpdates"))

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
      when(dWins, col("d.seq")).otherwise(baseSeq).as(LakeTable.SeqCol),
      when(dWins, isDel).otherwise(col(s"b.${LakeTable.DeletedCol}")).as(LakeTable.DeletedCol))

    val merged = observed.select(outCols: _*)
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
    // zstd halves the bytes hitting disk vs snappy for this content at a CPU
    // cost that scales with executors — the right trade for a write-heavy COW
    timed("join+write")(
      routed.write.mode("overwrite").option("compression", "zstd")
        .partitionBy("_bucket").parquet(commitDir))

    // `get` blocks until the (already finished) write's listener delivers
    val mm: Map[String, Any] = obs.get
    def m(name: String): Long = mm.get(name) match {
      case Some(v: Long) => v
      case Some(v: java.lang.Long) => v.longValue()
      case _ => 0L
    }
    val (applied, tombstones, upserts, conflicts, duplicates) =
      (m("applied"), m("tombstones"), m("upserts"), m("conflicts"), m("duplicates"))

    val newBuckets: Seq[BucketFile] =
      timed("footer-list")(table.listWrittenBuckets(commitDir, sch.schemaId))
    val metricsDelta = Map(
      "eventsApplied" -> applied,
      "upserts" -> upserts,
      "tombstonesWritten" -> tombstones,
      "conflictsLww" -> conflicts,
      "duplicatesIgnored" -> duplicates,
      "noopUpdates" -> m("noopUpdates"),
      "batches" -> 1L) ++ extraMetrics
    table.commit(affected, newBuckets, fenceDelta, metricsDelta, batchId)
    MergeResult(applied, upserts, tombstones, conflicts, duplicates, affected.size)
  }
}
