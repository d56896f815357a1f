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
  * Job economy (scale note): one batch costs exactly TWO distributed jobs —
  * a per-partition stats pass (counts, high-water marks, dead-letter counts,
  * and affected-bucket discovery via collect_set) and the dedup→merge→write
  * pipeline (lineage metrics ride it via Dataset.observe) — plus tiny
  * driver-side footer reads and a JSONL lineage append. No per-event driver
  * work, no collect of event data.
  */
object Ingest {

  private val prof = sys.env.contains("GRAFT_PROF")
  private def timed[T](name: String)(f: => T): T =
    if (!prof) f else {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof-ingest] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

  final case class IngestConfig(
      filter: FilterChain = FilterChain.passAll,
      salt: Int = 1,
      /** Merge-on-read mode (Hudi-MOR / Iceberg-v2 analog): row batches are
        * APPENDED as bucketed delta event files (O(batch) write cost) instead
        * of copy-on-write merged (O(touched files)); reads resolve deltas by
        * LWW at query time and `Mor.fold` compacts them back into base files.
        * The streaming-throughput mode for high-frequency micro-batches whose
        * keys scatter across the whole table. Exactly-once, fences, DDL
        * barriers, dead letters and lineage are identical to COW mode. */
      morMode: Boolean = false,
      /** In MOR mode, fold delta files into base every N micro-batches
        * (0 = never; fold manually via `Mor.fold`/CLI `fold`). The fold
        * cadence bounds read amplification AND delta-file count — the MOR
        * compaction-scheduling knob (Hudi's compaction trigger analog).
        * Folding is concurrency-safe beside the appends (optimistic retry;
        * late appends survive by path-level replacement). */
      morFoldEvery: Int = 0,
      /** Partial-fold threshold forwarded to [[Mor.fold]] on each cadence
        * tick: > 0 folds only buckets whose backlog reached this many
        * events (cost O(touched buckets), the 100 TB shape — a scattered
        * backlog no longer triggers a full-table rewrite mid-stream) and
        * compacts the rest of the delta log; 0 keeps cadence folds
        * unconditional. */
      morFoldMinEventsPerBucket: Long = 0L,
      /** Run cadence folds ASYNC on a per-table daemon thread
        * ([[MorFolds]]) so compaction overlaps ingest instead of blocking
        * the micro-batch loop (Hudi async-compaction shape; safe by the
        * same optimistic-concurrency machinery that lets a manual fold run
        * beside a live tail). A tick whose previous fold is still running
        * skips — backlog rides to the next tick. false = fold inline in
        * the batch (strict backlog bound per tick, at ingest-latency
        * cost). */
      morFoldAsync: Boolean = true,
      /** In MOR mode, LWW-dedup each micro-batch before appending it (the
        * default). Semantically optional — read resolution and fold ALREADY
        * dedup across all delta files with the same LastWriterAgg — so this
        * is purely a cost trade: dedup pays one shuffle per batch to shrink
        * the written delta volume by the batch's key-duplication ratio; raw
        * appends (false — the Hudi log-file shape) make a micro-batch one
        * shuffle-free scan+filter+write job but write every event. Measured
        * on the 2M-event bench log (≈7× in-batch duplication): dedup wins;
        * a low-duplication source (unique keys per batch) should turn this
        * off and skip the shuffle. */
      morDedupPerBatch: Boolean = true,
      /** Maintain the transactional per-bucket flat-delta histogram on each
        * MOR append (numBuckets conditional sums riding the write job's
        * Observation). The histogram buys zero-job fold scheduling and
        * bucket-pruned reads on a LIVE tail; a bounded catch-up replay
        * (AvailableNow) schedules no cadence folds and ends in a full fold
        * that self-heals the histogram to exact-empty, so streaming entry
        * points disable it there (measured ~15% of bulk-stream wall at 64
        * buckets). Off ⇒ commits poison the histogram (Add(None)) and
        * schedulers fall back to one narrow scan. */
      morBatchHistogram: Boolean = true,
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
      orderedDelivery: Boolean = false,
      /** When set, every applied micro-batch also maintains a persisted
        * near-duplicate signature store at this directory
        * ([[graft.operators.SigStore.maintainFromEvents]]): the LWW winner
        * of each content-carrying key is re-signed (MinHash bands + SimHash
        * sketch), deletes tombstone the doc. Incoming batches can then be
        * near-dup-checked against the whole corpus in O(batch) via
        * [[graft.operators.SigStore.incrementalPairs]] — no corpus rescan.
        * Store writes are append-only and idempotent, so they need no extra
        * exactly-once machinery beyond the stream's own batch retry. */
      sigStoreDir: Option[String] = None,
      /** Signature parameters for [[sigStoreDir]] (bands, rows per band,
        * shard fan-out). Must match across all writers of one store. */
      sigStoreCfg: graft.operators.SigStore.Config = graft.operators.SigStore.Config())

  object IngestConfig {
    /** Default config for STREAMING entry points (`run`/`tail`/`tailrules`):
      * merge-on-read appends with an async partial-fold cadence — the shape
      * that sustains high-frequency micro-batches whose keys scatter across
      * the table (COW streaming pays an O(touched files) rewrite per batch,
      * measured ~8× slower on the bench stream). Batch `replay` keeps the
      * plain COW default (one big merge wins there). Opt out per-process
      * with GRAFT_MOR=0. */
    val streamingDefault: IngestConfig = IngestConfig(
      morMode = true, morFoldEvery = 2, morFoldMinEventsPerBucket = 16384L)
  }

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

  // ---------------------------------------------------------------- pending
  // Cross-batch DDL ordering (SURVEY §4.3.3, VERDICT r2 #5): a row event can
  // arrive a micro-batch BEFORE the DDL that defines one of its image columns
  // (partitions of the source are mutually unordered). Silently dropping the
  // field would lose data the day images carry evolved columns — instead the
  // WHOLE row is held back in a durable side store and re-applied once the
  // schema catches up. Holding the whole row (not just the field) matters:
  // a half-applied row could not be re-applied later, because its seq would
  // compare as a duplicate under LWW.
  //
  // Convergence stays exact because application order is immaterial (LWW +
  // tombstones, ConvergencePropertySpec); exactly-once degrades gracefully to
  // at-least-once for held rows (re-application is neutralized as duplicates).

  private def pendingRoot(table: LakeTable): java.nio.file.Path =
    java.nio.file.Paths.get(table.dir, "_pending")

  /** Condition marking a row as NOT applicable under the current schema: a
    * non-null value in an image field the schema cannot resolve. */
  private def holdCondition(unresolved: Set[String]): org.apache.spark.sql.Column =
    unresolved.toSeq.sorted.map(f => col(s"after.$f").isNotNull)
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Split `seg` into (apply-now, held-back-count); held rows are persisted
    * under `_pending/batch-<id>-seg<k>` (overwritten on a foreachBatch retry —
    * exactly-once for the side store like dead letters). Also the FOLD-time
    * resolve guard for merge-on-read (`Mor.fold`): MOR appends store events
    * schema-agnostically, so unresolved-field hold-back happens exactly once,
    * when deltas fold into base. */
  private[ingest] def holdBack(table: LakeTable, seg: DataFrame, imageFields: Set[String],
      batchId: Long, segIdx: Int): (DataFrame, Long) = {
    val unresolved = MergeApply.bindImageFields(table.snapshot, imageFields)._2
    if (unresolved.isEmpty) return (seg, 0L)
    val cond = holdCondition(unresolved)
    val held = seg.filter(cond)
    val n = held.count()
    if (n == 0L) return (seg, 0L)
    val name =
      if (batchId >= 0) s"batch-$batchId-seg$segIdx"
      else s"adhoc-${java.util.UUID.randomUUID().toString.take(8)}"
    held.write.mode(SaveMode.Overwrite)
      .parquet(pendingRoot(table).resolve(name).toString)
    (seg.filter(!cond), n)
  }

  /** Re-apply pending rows whose image fields the (possibly just-evolved)
    * schema now resolves; consolidate the rest. Crash-ordering: the retained
    * remainder is rewritten FIRST, then the resolvable rows merge, then the
    * drained dirs are deleted — every crash window re-applies rows (converges
    * under LWW) rather than losing them. Returns rows re-applied. */
  def drainPending(table: LakeTable): Long = {
    import java.nio.file.Files
    val root = pendingRoot(table)
    if (!Files.isDirectory(root)) return 0L
    val subdirs = graft.lake.LakeTable.listDir(root).filter(Files.isDirectory(_))
    if (subdirs.isEmpty) return 0L
    val spark = table.spark
    val all = subdirs
      .map(d => spark.read.parquet(d.toString))
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    val imageFields: Set[String] = all.schema("after").dataType match {
      case s: StructType => s.fieldNames.toSet
      case _ => Set.empty
    }
    val unresolved = MergeApply.bindImageFields(table.snapshot, imageFields)._2
    val cond = holdCondition(unresolved)
    val resolvable = all.filter(!cond)
    val nResolvable = resolvable.count()
    val retained = all.filter(cond)
    val nRetained = retained.count()
    if (nRetained > 0)
      retained.write.mode(SaveMode.Overwrite).parquet(root.resolve(
        s"retained-${java.util.UUID.randomUUID().toString.take(8)}").toString)
    if (nResolvable > 0)
      MergeApply.merge(table, Dedup.lastWriterPerKey(resolvable), Map.empty,
        extraMetrics = Map("pendingDrained" -> nResolvable))
    subdirs.foreach(d => org.apache.commons.io.FileUtils.deleteQuietly(d.toFile))
    nResolvable
  }

  /** Apply one batch of change events. Idempotent under re-delivery:
    * a batchId at or below the committed one is skipped wholesale (streaming
    * retry), and per-row offsets at or below the fence are skipped (replay
    * from an older checkpoint / at-least-once source).
    */
  def applyBatch(
      table: LakeTable,
      batch: DataFrame,
      batchId: Long = -1L,
      cfg: IngestConfig = IngestConfig()): BatchMetrics = timed(s"batch-$batchId-total") {
    val spark = table.spark
    val snap0 = table.refresh()

    if (batchId >= 0 && batchId <= snap0.committedBatchId) {
      // foreachBatch retry of an already-committed batch: exact no-op.
      return BatchMetrics(batchId, 0, 0, 0, 0, 0, 0, 0, 0, snap0.version)
    }

    // Termination-tick fast path: Trigger.AvailableNow delivers one final
    // batch with ZERO input splits (and restarts can deliver empty catch-up
    // batches). Detectable on the driver without running any job — the
    // physical scan has no partitions — so the full apply pipeline (stats
    // job, write job, footer list) collapses to one fence-only commit that
    // still records the batchId for the exactly-once fence.
    if (batchIsPlanEmpty(batch)) {
      graft.lake.LakeTable.withCommitRetry(table)(table.commit(
        Set.empty, Seq.empty, Map.empty,
        Map("eventsSeen" -> 0L, "batches" -> 1L), batchId))
      return BatchMetrics(batchId, 0, 0, 0, 0, 0, 0, 0, 0, table.snapshot.version)
    }

    // Merge-on-read batches take a dedicated fused path: ONE distributed job
    // per micro-batch (appends are schema-agnostic, so no probe/barrier pass
    // is needed — see applyBatchMor).
    if (cfg.morMode) return applyBatchMor(table, batch, batchId, cfg)

    // predicate pieces (pure Columns — composed into ONE stats pass)
    // try_element_at: a partition absent from the fence map must read as
    // "no fence" (null→-1), not an ANSI MAP_KEY_DOES_NOT_EXIST error
    val fenceCol =
      if (snap0.fence.isEmpty) lit(-1L)
      else coalesce(try_element_at(typedLit(snap0.fence), col("partition")), lit(-1L))
    val pastFence = col("offset") > fenceCol
    // row-level fence filtering only under an ordered-delivery contract
    val unfenced = if (cfg.orderedDelivery) pastFence else lit(true)
    val err = Validate.errorExpr
    val isRowOp = col("op").isin(Ops.rowOps.toSeq: _*)
    val passes = cfg.filter.expr

    // opt-in signature-store maintenance rides the batch BEFORE the merge
    // (same filter chain as the table; fence filtering is unnecessary —
    // re-delivered old events append below the head seq, which reads drop)
    cfg.sigStoreDir.foreach(d => timed(s"batch-$batchId-sigstore")(
      graft.operators.SigStore.maintainFromEvents(
        d, batch.filter(err.isNull && isRowOp && passes), cfg.sigStoreCfg)))

    // Deliberately NOT persisting the batch: for parquet-backed micro-batches
    // a columnar cache build costs far more than the two vectorized re-scans
    // this pipeline does (one stats pass, one dedup pass) — measured 4×
    // slower with persist at 2M events.
    val cached = batch

    // ---- fresh-table fast path (initial load / bulk replay) --------------
    // With no manifest files there is nothing to select, so the expensive
    // per-partition stats scan is unnecessary: a NARROW probe job (op, seq,
    // ddl + one leaf per image struct — nested schema pruning keeps content
    // out) collects DDLs and counts, and the fence/per-partition stats ride
    // the merge job itself via Dataset.observe (PartitionLongAgg). One full
    // scan per batch saved — at bulk-replay scale that is ~30% of wall-clock
    // and DRAM traffic.
    if (snap0.files.isEmpty) {
      val isLiveRow = unfenced && err.isNull && isRowOp && passes
      val probe = timed("probe-job")(cached.select(
        count(lit(1)).as("total"),
        sum(when(pastFence, 1L).otherwise(0L)).as("pastFence"),
        sum(when(unfenced && err.isNotNull, 1L).otherwise(0L)).as("dl"),
        sum(when(isLiveRow, 1L).otherwise(0L)).as("nrows"),
        collect_list(when(unfenced && err.isNull && col("op") === Ops.Ddl,
          struct(col("seq"), col("ddl")))).as("ddls"))
        .collect()(0))
      def pL(i: Int): Long = if (probe.isNullAt(i)) 0L else probe.getLong(i)
      val total = pL(0); val pastFenceN = pL(1); val dlCount = pL(2); val rowCount = pL(3)
      val unfencedN = if (cfg.orderedDelivery) pastFenceN else total
      val ddls = probe.getSeq[Row](4).map(r => (r.getLong(0), r.getStruct(1))).sortBy(_._1)
      val imageFields: Set[String] = cached.schema("after").dataType match {
        case s: StructType => s.fieldNames.toSet
        case _ => Set.empty
      }
      def isBarrier(ddl: Row): Boolean = {
        def s(name: String): String = {
          val i = ddl.fieldIndex(name)
          if (ddl.isNullAt(i)) null else ddl.getString(i)
        }
        imageFields.contains(s("column")) ||
          (s("kind") == "rename_column" && imageFields.contains(s("newName")))
      }
      if (ddls.forall { case (_, ddl) => !isBarrier(ddl) }) {
        if (dlCount > 0) appendDeadLetters(table, cached.filter(unfenced && err.isNotNull), batchId)
        ddls.foreach { case (ddlSeq, ddl) =>
          if (ddlSeq > table.snapshot.ddlSeq) applyDdl(table, ddlSeq, ddl)
        }
        val extra = Map("deadLetters" -> dlCount, "eventsSeen" -> total)
        val (bm, fenceDelta, perPartRows) =
          if (rowCount == 0) {
            // nothing to merge: fence via a tiny dedicated agg, fence-only commit
            val f = cached.groupBy(col("partition")).agg(
              max(col("offset")).as("m"),
              sum(when(isLiveRow, 1L).otherwise(0L)).as("n")).collect()
            val fence = f.map(r => r.getInt(0) -> r.getLong(1)).toMap
            val rows = f.map(r => r.getInt(0) -> (if (r.isNullAt(2)) 0L else r.getLong(2))).toMap
            // fence-only commit is snapshot-independent — pure re-commit on a race
            graft.lake.LakeTable.withCommitRetry(table)(
              table.commit(Set.empty, Seq.empty, fence, extra + ("batches" -> 1L), batchId))
            (BatchMetrics(batchId, total, dlCount,
              math.max(unfencedN - dlCount - ddls.length - rowCount, 0),
              total - unfencedN, 0, 0, 0, ddls.length, table.snapshot.version),
              fence, rows)
          } else {
            val obs = org.apache.spark.sql.Observation(s"ingest-${java.util.UUID.randomUUID()}")
            // perPartRows counts RAW events per partition (not live rows):
            // re-evaluating the validity predicate inside an interpreted
            // per-row aggregate would cost more than the statistic is worth
            val observed = cached.observe(obs,
              graft.functions.PartitionLongAgg.partitionMax(col("partition"), col("offset")).as("fence"),
              graft.functions.PartitionLongAgg.partitionSum(col("partition"), lit(1L)).as("perPartRows"))
            val rowEvents0 = observed.filter(unfenced && err.isNull && isRowOp && passes)
            // rows whose image fields outran their DDL wait in _pending
            val (rowEvents, heldN) = holdBack(table, rowEvents0, imageFields, batchId, 0)
            def obsFence: Map[Int, Long] =
              graft.functions.PartitionLongAgg.metricMap(obs.get.apply("fence"))
            if (heldN == rowCount) {
              // EVERY live row was held back: no merge (an all-empty observed
              // merge risks AQE pruning the metrics node); the hold-back count
              // job already ran the observed scan, so the fence is available
              val fence = obsFence
              val rows = graft.functions.PartitionLongAgg.metricMap(obs.get.apply("perPartRows"))
              graft.lake.LakeTable.withCommitRetry(table)(table.commit(
                Set.empty, Seq.empty, fence,
                extra + ("batches" -> 1L, "pendingHeldBack" -> heldN), batchId))
              (BatchMetrics(batchId, total, dlCount,
                math.max(unfencedN - dlCount - ddls.length - rowCount, 0),
                total - unfencedN, 0, 0, 0, ddls.length, table.snapshot.version),
                fence, rows)
            } else {
              val deduped =
                if (cfg.saltedDedup > 1) Dedup.lastWriterPerKeySalted(rowEvents, cfg.saltedDedup)
                else Dedup.lastWriterPerKey(rowEvents)
              val extraM =
                if (heldN > 0) extra + ("pendingHeldBack" -> heldN) else extra
              val r =
                MergeApply.merge(table, deduped,
                  fenceDelta = obsFence, batchId = batchId, salt = cfg.salt,
                  extraMetrics = extraM,
                  selection = Some(MergeApply.FileSelection(
                    Seq.empty, (0 until table.numBuckets).toSet, rowCount - heldN)))
              val fence = obsFence
              val rows = graft.functions.PartitionLongAgg.metricMap(obs.get.apply("perPartRows"))
              (BatchMetrics(batchId, total, dlCount,
                math.max(unfencedN - dlCount - ddls.length - rowCount, 0),
                total - unfencedN, r.eventsApplied, r.tombstonesWritten, r.conflictsLww,
                ddls.length, table.snapshot.version),
                fence, rows)
            }
          }
        timed("lineage-append")(appendLineage(table, bm, fenceDelta, perPartRows))
        drainPending(table)
        return bm
      }
      // barrier DDL on a fresh table: fall through to the stats path below
    }

    locally {
      // ---- single per-partition stats job (counts + high-water marks +
      //      affected buckets + hit manifest files for the COW pruning) ----
      val isLiveRow = unfenced && err.isNull && isRowOp && passes
      val bucketOf = pmod(hash(col("repo"), col("path")), lit(table.numBuckets))
      val hkeyOf = xxhash64(col("repo"), col("path"))
      val baseAggs = Seq(
        count(lit(1)).as("total"),
        max(col("offset")).as("maxOff"),
        sum(when(pastFence, 1L).otherwise(0L)).as("unfenced"),
        sum(when(unfenced && err.isNotNull, 1L).otherwise(0L)).as("dl"),
        sum(when(unfenced && err.isNull && col("op") === Ops.Ddl, 1L).otherwise(0L)).as("nddl"),
        sum(when(isLiveRow, 1L).otherwise(0L)).as("nrows"),
        collect_set(when(isLiveRow, bucketOf)).as("buckets"),
        // the merge joins the DEDUPED delta, so the broadcast-vs-shuffle
        // strategy must be sized by distinct KEYS, not raw events (a CDC
        // batch re-touching hot keys dedups 10-100×). Summing per-partition
        // approx counts can only OVER-estimate — errs toward the shuffle.
        approx_count_distinct(when(isLiveRow, hkeyOf)).as("keys"))
      // file hits ride the same pass when the manifest is small enough for
      // the plan-literal lookup; a large manifest (10^5+ files at 100 TB)
      // goes through a SECOND narrow job with a broadcast range join instead
      // — plan size must stay O(1) in the file count
      val literalHits =
        snap0.files.nonEmpty && MergeApply.useLiteralManifest(snap0)
      val aggs =
        if (!literalHits) baseAggs
        else baseAggs :+ collect_set(
          when(isLiveRow, MergeApply.fileHitExpr(snap0, bucketOf, hkeyOf))).as("hits")
      val stats = timed("stats-job")(cached.groupBy(col("partition"))
        .agg(aggs.head, aggs.tail: _*)
        .collect())
      def sumL(i: Int): Long = stats.map(r => if (r.isNullAt(i)) 0L else r.getLong(i)).sum
      val total = sumL(1); val pastFenceN = sumL(3)
      val unfencedN = if (cfg.orderedDelivery) pastFenceN else total
      val dlCount = sumL(4); val ddlCount = sumL(5); val rowCount = sumL(6)
      val fenceDelta: Map[Int, Long] =
        stats.map(r => r.getInt(0) -> r.getLong(2)).toMap
      val perPartRows: Map[Int, Long] =
        stats.map(r => r.getInt(0) -> (if (r.isNullAt(6)) 0L else r.getLong(6))).toMap
      val affectedBuckets: Set[Int] =
        stats.flatMap(r => r.getSeq[Int](7)).toSet
      // post-dedup sizing hints for the merge-strategy choice
      val keysHint: Long =
        math.min(rowCount, stats.map(r => if (r.isNullAt(8)) 0L else r.getLong(8)).sum)
      // byte estimate WITHOUT touching the content column (an octet_length in
      // the stats pass would defeat the scan's column pruning — measured 1.7×
      // on bulk replay): compressed source-file bytes scaled by the dedup
      // ratio. Underestimates by the compression ratio (~2-3× for text),
      // which the 64 MB broadcast gate's headroom absorbs; the gate exists
      // to stop multi-GB blob pathologies, not to be exact.
      val bytesHint: Long = {
        val src = try cached.inputFiles.map { f =>
          try java.nio.file.Files.size(java.nio.file.Paths.get(new java.net.URI(f)))
          catch { case _: Exception => 0L }
        }.sum catch { case _: Exception => -1L }
        if (src >= 0 && total > 0) (src.toDouble * keysHint / total).toLong else -1L
      }
      val hitFiles: Seq[graft.lake.DataFile] =
        if (snap0.files.isEmpty) Seq.empty
        else if (literalHits)
          stats.flatMap(_.getSeq[scala.collection.Seq[Int]](9).flatten)
            .distinct.sorted.map(snap0.files)
        else {
          val byPath = snap0.files.iterator.map(f => f.path -> f).toMap
          MergeApply.fileHitsDF(table, snap0,
            cached.filter(unfenced && err.isNull && isRowOp && passes),
            bucketOf, hkeyOf)
            .collect().map(_.getString(0)).sorted.toSeq.map(byPath)
        }

      if (dlCount > 0) appendDeadLetters(table, cached.filter(unfenced && err.isNotNull), batchId)

      val rowEvents = cached.filter(unfenced && err.isNull && isRowOp && passes)

      var applied = 0L; var tombstones = 0L; var conflicts = 0L
      var heldTotal = 0L; var segIdx = 0

      val imageFieldsStats: Set[String] = cached.schema("after").dataType match {
        case s: StructType => s.fieldNames.toSet
        case _ => Set.empty
      }

      def mergeSegment(seg: DataFrame, fence: Map[Int, Long], isLast: Boolean,
          wholeBatch: Boolean): Unit = {
        // cross-batch DDL ordering: rows whose image fields the CURRENT
        // schema (as of this segment) cannot resolve are held back durably
        val (segLive, heldN) = holdBack(table, seg, imageFieldsStats, batchId, segIdx)
        segIdx += 1; heldTotal += heldN
        val deduped =
          if (cfg.saltedDedup > 1) Dedup.lastWriterPerKeySalted(segLive, cfg.saltedDedup)
          else Dedup.lastWriterPerKey(segLive)
        // the stats pass discovered buckets/files for the WHOLE batch; that
        // selection is exact only for the undivided batch (and only when no
        // rows were held back). A DDL-split segment must discover its own
        // selection (merge's fallback pass) or every segment would
        // copy-on-write-rewrite every file the batch touches.
        val selection =
          if (!wholeBatch || heldN > 0) None
          else Some(MergeApply.FileSelection(hitFiles, affectedBuckets, keysHint, bytesHint))
        val extras =
          if (!isLast) Map.empty[String, Long]
          else {
            val m = Map("deadLetters" -> dlCount, "eventsSeen" -> total)
            if (heldTotal > 0) m + ("pendingHeldBack" -> heldTotal) else m
          }
        val r = MergeApply.merge(table, deduped, fence,
          batchId = if (isLast) batchId else -1L, salt = cfg.salt,
          extraMetrics = extras,
          selection = selection)
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

      // A DDL only needs a BARRIER (batch split before/after it) when it
      // touches a column the row images actually carry — otherwise it
      // commutes with row application: add_column of a fresh column reads
      // null either way; widen/rename of a column no image mentions produces
      // the same bytes whether existing values are cast/renamed before or
      // after the rows merge (updates preserve uncarried columns). Splitting
      // costs a full scan+dedup+merge PER SEGMENT, so recognizing commuting
      // DDLs keeps a schema-evolving replay at O(one merge) instead of
      // O(#DDLs) merges.
      def isBarrier(ddl: Row): Boolean = {
        def s(name: String): String = {
          val i = ddl.fieldIndex(name)
          if (ddl.isNullAt(i)) null else ddl.getString(i)
        }
        imageFieldsStats.contains(s("column")) ||
          (s("kind") == "rename_column" && imageFieldsStats.contains(s("newName")))
      }

      if (ddls.isEmpty) {
        mergeSegment(rowEvents, fenceDelta, isLast = true, wholeBatch = true)
      } else if (ddls.forall { case (_, ddl) => !isBarrier(ddl) }) {
        // all DDLs commute with this batch's rows: schema-only commits in seq
        // order, then ONE merge of the whole batch
        ddls.foreach { case (ddlSeq, ddl) =>
          if (ddlSeq > table.snapshot.ddlSeq) applyDdl(table, ddlSeq, ddl)
        }
        mergeSegment(rowEvents, fenceDelta, isLast = true, wholeBatch = true)
      } else {
        var lower = Long.MinValue
        ddls.foreach { case (ddlSeq, ddl) =>
          mergeSegment(rowEvents.filter(col("seq") > lower && col("seq") < ddlSeq),
            Map.empty, isLast = false, wholeBatch = false)
          // DDL fence: a retried batch skips DDL already in the schema log —
          // per-op checks cannot recognize an add→widen→rename chain as done
          if (ddlSeq > table.snapshot.ddlSeq) applyDdl(table, ddlSeq, ddl)
          lower = ddlSeq
        }
        mergeSegment(rowEvents.filter(col("seq") > lower), fenceDelta,
          isLast = true, wholeBatch = false)
      }

      val snap1 = table.snapshot
      val bm = BatchMetrics(batchId, total, dlCount,
        math.max(unfencedN - dlCount - ddlCount - rowCount, 0),
        total - unfencedN, applied, tombstones, conflicts, ddls.length, snap1.version)
      timed("lineage-append")(appendLineage(table, bm, fenceDelta, perPartRows))
      drainPending(table)
      bm
    }
  }

  /** Merge-on-read batch application — ONE distributed job per micro-batch.
    *
    * Why appends need no probe/barrier pass: a delta append stores EVENTS
    * verbatim (repo, path, op, seq, after-image) — nothing is resolved
    * against the schema at write time. All schema sensitivity lives at READ
    * and FOLD time, where [[graft.lake.ImageBinding]] binds image fields
    * through the schema log by column id (rename-safe) and `Mor.fold` holds
    * back rows whose fields the schema STILL cannot resolve (the cross-batch
    * DDL hole, handled once at the resolve point instead of per batch). So:
    *
    *  - counts, fence high-water marks, dead-letter counts, the batch's max
    *    seq AND the (rare, tiny) DDL list all ride the append job as ONE
    *    Observation on the source scan — no separate probe job;
    *  - in-batch DDL ordering needs no barrier split: events commute with
    *    schema-only commits because binding happens later. DDL schema
    *    commits are applied (ddlSeq-fenced) BEFORE the data commit, so a
    *    crash between them re-runs the batch and re-skips the applied DDL;
    *  - the data commit (fence + batchId + delta files) remains the single
    *    atomic exactly-once point, exactly like the COW path.
    *
    * Steady-state cost per micro-batch: one scan(+optional dedup shuffle) +
    * flat parquet write + a handful of footer reads + one pointer commit. */
  private def applyBatchMor(
      table: LakeTable,
      batch: DataFrame,
      batchId: Long,
      cfg: IngestConfig): BatchMetrics = timed(s"mor-batch-$batchId") {
    val snap0 = table.snapshot
    val fenceCol =
      if (snap0.fence.isEmpty) lit(-1L)
      else coalesce(try_element_at(typedLit(snap0.fence), col("partition")), lit(-1L))
    val pastFence = col("offset") > fenceCol
    val unfenced = if (cfg.orderedDelivery) pastFence else lit(true)
    val err = Validate.errorExpr
    val isRowOp = col("op").isin(Ops.rowOps.toSeq: _*)
    val passes = cfg.filter.expr
    val isLiveRow = unfenced && err.isNull && isRowOp && passes

    // opt-in signature-store maintenance (see applyBatch; same semantics)
    cfg.sigStoreDir.foreach(d => timed(s"mor-batch-$batchId-sigstore")(
      graft.operators.SigStore.maintainFromEvents(
        d, batch.filter(err.isNull && isRowOp && passes), cfg.sigStoreCfg)))

    val obs = org.apache.spark.sql.Observation(s"mor-${java.util.UUID.randomUUID()}")
    val observed = batch.observe(obs,
      graft.functions.PartitionLongAgg.partitionMax(col("partition"), col("offset")).as("fence"),
      graft.functions.PartitionLongAgg.partitionSum(col("partition"), lit(1L)).as("perPartRows"),
      count(lit(1)).as("total"),
      sum(when(pastFence, 1L).otherwise(0L)).as("pastFence"),
      sum(when(unfenced && err.isNotNull, 1L).otherwise(0L)).as("dl"),
      sum(when(isLiveRow, 1L).otherwise(0L)).as("nrows"),
      sum(when(isLiveRow && col("op") === Ops.Delete, 1L).otherwise(0L)).as("ndel"),
      max(when(isLiveRow, col("seq"))).as("maxSeq"),
      collect_list(when(unfenced && err.isNull && col("op") === Ops.Ddl,
        struct(col("seq"), col("ddl")))).as("ddls"))
    val rowEvents = observed.filter(isLiveRow)
    val payload0 =
      if (!cfg.morDedupPerBatch)
        rowEvents.select(col("repo"), col("path"), col("op"), col("seq"), col("after"))
      else if (cfg.saltedDedup > 1) Dedup.lastWriterPerKeySalted(rowEvents, cfg.saltedDedup)
      else Dedup.lastWriterPerKey(rowEvents)
    // Second observation ON THE WRITTEN PAYLOAD (post-dedup): the per-bucket
    // histogram must count exactly the delta FILE contents so the snapshot's
    // flatDeltaHist (fold scheduling, Snapshot.flatDeltaHist) stays exact.
    // Same fused-job principle — conditional sums ride the write, no extra
    // job. Disabled above HistMaxBuckets (Add(None) ⇒ scan fallback).
    val histN =
      if (!cfg.morBatchHistogram) 0
      else if (snap0.numBuckets <= graft.lake.Snapshot.HistMaxBuckets) snap0.numBuckets else 0
    val histObs = org.apache.spark.sql.Observation(s"mor-hist-${java.util.UUID.randomUUID()}")
    val payload =
      if (histN == 0) payload0
      else {
        val aggs = (0 until histN)
          .map(i => sum(when(col("_hb") === i, 1L).otherwise(0L)).as(s"_h$i"))
        payload0.withColumn("_hb", table.bucketExpr(col("repo"), col("path")))
          .observe(histObs, aggs.head, aggs.tail: _*)
          .drop("_hb")
      }

    // the write job IS the stats job (observation above rides its scan);
    // an empty batch writes no files and the commit is fence-only
    val commitDir = table.newCommitDataDir()
    timed(s"mor-$batchId-write")(payload.write.mode("overwrite")
      .options(Map("compression" -> MergeApply.deltaFileCodec,
        "maxRecordsPerFile" -> snap0.targetFileRows.toString))
      .parquet(commitDir))
    val newDeltas = timed(s"mor-$batchId-footers")(table.listWrittenFilesFlat(commitDir, snap0.schemaId))

    // timed read (MergeApply.observedMetrics): a pruned metrics node must
    // surface loudly, never hang the stream. When the written payload is
    // EMPTY (all rows fenced/filtered, or an empty trigger), AQE's
    // empty-relation propagation can drop the CollectMetrics node and the
    // observation comes back EMPTY — exactly the round-2 hazard the COW path
    // dodges with its rowCount==0 special case. Those batches (and only
    // those) fall back to one dedicated per-partition stats job.
    // a blocked (never-delivering) observation surfaces as TimeoutException
    // after 120s — treat like the empty case and recompute from the source
    val mm0 = timed(s"mor-$batchId-obs")(try MergeApply.observedMetrics(obs)
      catch { case _: java.util.concurrent.TimeoutException => Map.empty[String, Any] })
    val mm: Map[String, Any] =
      if (mm0.nonEmpty) mm0
      else {
        val rows = batch.groupBy(col("partition")).agg(
          count(lit(1)).as("n"),
          max(col("offset")).as("maxOff"),
          sum(when(pastFence, 1L).otherwise(0L)).as("pastFence"),
          sum(when(unfenced && err.isNotNull, 1L).otherwise(0L)).as("dl"),
          sum(when(isLiveRow, 1L).otherwise(0L)).as("nrows"),
          sum(when(isLiveRow && col("op") === Ops.Delete, 1L).otherwise(0L)).as("ndel"),
          max(when(isLiveRow, col("seq"))).as("maxSeq"),
          collect_list(when(unfenced && err.isNull && col("op") === Ops.Ddl,
            struct(col("seq"), col("ddl")))).as("ddls")).collect()
        def sumL(i: Int): Long = rows.map(r => if (r.isNullAt(i)) 0L else r.getLong(i)).sum
        Map(
          "total" -> sumL(1),
          "pastFence" -> sumL(3), "dl" -> sumL(4), "nrows" -> sumL(5), "ndel" -> sumL(6),
          "maxSeq" -> rows.flatMap(r => if (r.isNullAt(7)) None else Some(r.getLong(7)))
            .maxOption.getOrElse(-1L),
          "fence" -> rows.map(r => r.getInt(0) -> r.getLong(2)).toMap,
          "perPartRows" -> rows.map(r => r.getInt(0) -> r.getLong(1)).toMap,
          "ddls" -> rows.flatMap(_.getSeq[Row](8)).toSeq)
      }
    def metricL(name: String): Long = mm.get(name) match {
      case Some(v: Long) => v
      case Some(v: java.lang.Long) => v.longValue()
      case _ => if (name == "maxSeq") -1L else 0L
    }
    val total = metricL("total"); val dlCount = metricL("dl")
    val rowCount = metricL("nrows"); val ndel = metricL("ndel")
    val unfencedN = if (cfg.orderedDelivery) metricL("pastFence") else total
    val fenceDelta = graft.functions.PartitionLongAgg.metricMap(mm("fence"))
    val perPartRows = graft.functions.PartitionLongAgg.metricMap(mm("perPartRows"))
    val ddls: Seq[(Long, Row)] = (mm("ddls") match {
      case s: scala.collection.Seq[_] => s.collect { case r: Row => (r.getLong(0), r.getStruct(1)) }
      case _ => Seq.empty
    }).sortBy(_._1).toSeq

    if (dlCount > 0)
      appendDeadLetters(table, batch.filter(unfenced && err.isNotNull), batchId)
    // schema-only DDL commits FIRST (ddlSeq-fenced; see ordering note above)
    ddls.foreach { case (ddlSeq, ddl) =>
      if (ddlSeq > table.snapshot.ddlSeq) applyDdl(table, ddlSeq, ddl)
    }
    // delta files carry no bucket layout, so a racing rebucket cannot
    // invalidate them — plain optimistic retry suffices for the data commit
    val batchHist: Option[Map[Int, Long]] =
      if (histN == 0 || newDeltas.isEmpty) None
      else try {
        val hm = MergeApply.observedMetrics(histObs)
        if (hm.isEmpty) None // AQE empty-relation hazard: poison, scan fallback
        else Some((0 until histN).iterator.map { i =>
          i -> (hm.get(s"_h$i") match {
            case Some(v: Long) => v
            case Some(v: java.lang.Long) => v.longValue()
            case _ => 0L
          })
        }.filter(_._2 > 0L).toMap)
      } catch { case _: java.util.concurrent.TimeoutException => None }
    timed(s"mor-$batchId-commit")(graft.lake.LakeTable.withCommitRetry(table) {
      // the histogram was computed under snap0's bucket layout (_hb used
      // table.bucketExpr at plan-build time); a rebucket racing this batch
      // would land a histogram keyed to the OLD layout — same blast radius
      // as a wrong-exact histogram. Recheck inside the retry and poison to
      // scan fallback when the layout moved (mirrors RebucketedDuringAppend
      // in appendDelta, which must redo the write; delta files themselves
      // carry no layout so Add(None) suffices here).
      val hist =
        if (newDeltas.isEmpty) graft.lake.FlatHistOp.Keep
        else if (table.snapshot.numBuckets != snap0.numBuckets)
          graft.lake.FlatHistOp.Add(None)
        else graft.lake.FlatHistOp.Add(batchHist)
      table.commit(
        Set.empty, Seq.empty, fenceDelta,
        Map("eventsApplied" -> rowCount,
          "tombstonesWritten" -> ndel,
          "deltaEventsAppended" -> newDeltas.iterator.map(_.rows).sum,
          "deltaFilesWritten" -> newDeltas.size.toLong,
          "deadLetters" -> dlCount, "eventsSeen" -> total,
          "batches" -> 1L),
        batchId, maxSeq = metricL("maxSeq"), newDeltaFiles = newDeltas,
        flatHistOp = hist)
    })

    val bm = BatchMetrics(batchId, total, dlCount,
      math.max(unfencedN - dlCount - ddls.length - rowCount, 0),
      total - unfencedN, rowCount, ndel, 0, ddls.length, table.snapshot.version)
    timed("lineage-append")(appendLineage(table, bm, fenceDelta, perPartRows))
    drainPending(table)
    bm
  }

  /** True iff the batch is provably empty from the plan alone (no job, no
    * scan): either an empty LocalRelation (how MicroBatchExecution represents
    * a no-new-files trigger) or a physical plan with zero input partitions.
    * `toRdd` only instantiates the plan — lazily; it launches nothing. */
  private def batchIsPlanEmpty(batch: DataFrame): Boolean =
    try batch.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.isEmpty
      case _ => batch.queryExecution.toRdd.getNumPartitions == 0
    } catch { case _: Throwable => false } // never let the fast path block a batch

  /** Batch replay of a whole changelog (the `Trigger.AvailableNow`-style
    * entry used by tests and the benchmark's batch mode). */
  def replayLog(table: LakeTable, log: DataFrame, cfg: IngestConfig = IngestConfig()): BatchMetrics =
    applyBatch(table, log, batchId = table.snapshot.committedBatchId + 1, cfg)

  /** Apply one DDL event. Idempotence is guaranteed by the snapshot's
    * `ddlSeq` fence at the call site (a foreachBatch retry re-delivers the
    * whole batch; a crash between the schema-evolution commit and the final
    * data commit must not re-apply DDL). The per-op checks below are a second
    * line of defense for out-of-band schema edits: a DDL whose effect is
    * already present is a no-op, a conflicting one dead-letters.
    */
  private def applyDdl(table: LakeTable, ddlSeq: Long, ddl: Row): Unit =
    // schema-only commits retry on version races (checks below are idempotent
    // and re-read the refreshed schema)
    graft.lake.LakeTable.withCommitRetry(table)(applyDdlOnce(table, ddlSeq, ddl))

  private def applyDdlOnce(table: LakeTable, ddlSeq: Long, ddl: Row): Unit = {
    def s(name: String): String = {
      val i = ddl.fieldIndex(name)
      if (ddl.isNullAt(i)) null else ddl.getString(i)
    }
    val sch = table.schema
    s("kind") match {
      case "add_column" =>
        sch.find(s("column")) match {
          case Some(c) if c.dataType == s("toType") => () // already applied
          case Some(c) =>
            appendDeadLetterNote(table,
              s"add_column ${s("column")} type conflict: have ${c.dataType}, want ${s("toType")}")
          case None => table.evolveSchema(_.addColumn(s("column"), s("toType")), ddlSeq)
        }
      case "rename_column" =>
        (sch.find(s("column")), sch.find(s("newName"))) match {
          case (Some(_), None) => table.evolveSchema(_.renameColumn(s("column"), s("newName")), ddlSeq)
          case (None, Some(_)) => () // already applied
          case _ =>
            appendDeadLetterNote(table, s"rename_column ${s("column")}→${s("newName")} unresolvable")
        }
      case "widen_type" =>
        sch.find(s("column")) match {
          case Some(c) if c.dataType == s("toType") => () // already applied
          case Some(_) => table.evolveSchema(_.widenType(s("column"), s("toType")), ddlSeq)
          case None =>
            appendDeadLetterNote(table, s"widen_type on missing column ${s("column")}")
        }
      case other =>
        // unknown DDL: dead-letter semantics — record, don't crash.
        appendDeadLetterNote(table, s"unknown ddl kind: $other")
    }
  }

  /** Dead letters are keyed by batchId: a foreachBatch RETRY of batch N
    * overwrites `_errors/_batchId=N` instead of appending a second copy, so
    * the side output is exactly-once like the main commit (a crash between
    * this write and the snapshot commit re-runs the batch and re-writes the
    * same dir). Ad-hoc batches (batchId < 0) append under `_batchId=-1` —
    * at-least-once, documented. */
  private def appendDeadLetters(table: LakeTable, dl: DataFrame, batchId: Long): Unit = {
    val out = dl.withColumn("_error", Validate.errorExpr)
    if (batchId >= 0)
      out.write.mode(SaveMode.Overwrite).parquet(s"${table.dir}/_errors/_batchId=$batchId")
    else
      out.write.mode(SaveMode.Append).parquet(s"${table.dir}/_errors/_batchId=-1")
  }

  /** Per-writer (per-process) suffix for ad-hoc append files: two concurrent
    * ad-hoc writers (a maintenance job beside a backfill) each append to
    * their OWN file, so lines can never interleave mid-record. Readers
    * aggregate over the whole directory (spark.read.json / CLI report), so
    * the split is invisible to consumers. Batch-keyed paths stay as they are
    * (one exactly-once writer by construction). */
  private lazy val writerId: String = java.util.UUID.randomUUID().toString.take(8)

  private def appendDeadLetterNote(table: LakeTable, msg: String): Unit = {
    val dir = java.nio.file.Paths.get(s"${table.dir}/_errors_notes")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve(s"notes-$writerId.jsonl"),
      graft.lake.Json.obj("_error" -> graft.lake.Json.quote(msg)) + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  /** Lineage is tiny per-batch metadata (one summary line + one line per log
    * partition) — written driver-side as JSONL, not via a Spark job: a
    * 1-row parquet write costs a full job (~0.5s of the per-batch serial
    * budget), a file write costs microseconds. Keyed by batchId (one file per
    * batch, truncate-on-retry) so a foreachBatch retry never duplicates
    * lineage lines; ad-hoc batches (batchId < 0) append to a shared file.
    * Read back with spark.read.json over the directory.
    */
  private def appendLineage(
      table: LakeTable, bm: BatchMetrics, fenceDelta: Map[Int, Long],
      perPartRows: Map[Int, Long]): Unit = {
    def line(partition: Int, maxOffset: Long, seen: Long, applied: Long,
        tomb: Long, confl: Long, dl: Long): String =
      s"""{"batchId":${bm.batchId},"snapshotVersion":${bm.snapshotVersion},""" +
      s""""partition":$partition,"maxOffset":$maxOffset,"eventsSeen":$seen,""" +
      s""""eventsApplied":$applied,"tombstones":$tomb,"conflictsLww":$confl,""" +
      s""""deadLetters":$dl}"""
    val lines =
      line(-1, -1L, bm.eventsSeen, bm.eventsApplied, bm.tombstonesWritten,
        bm.conflictsLww, bm.deadLetters) +:
      fenceDelta.toSeq.sortBy(_._1).map { case (p, mo) =>
        line(p, mo, perPartRows.getOrElse(p, 0L), -1L, -1L, -1L, -1L)
      }
    val dir = java.nio.file.Paths.get(s"${table.dir}/_lineage")
    java.nio.file.Files.createDirectories(dir)
    if (bm.batchId >= 0)
      java.nio.file.Files.writeString(dir.resolve(s"batch-${bm.batchId}.jsonl"),
        lines.mkString("", "\n", "\n"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    else
      java.nio.file.Files.writeString(dir.resolve(s"adhoc-$writerId.jsonl"),
        lines.mkString("", "\n", "\n"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  /** Read the lineage/metrics table (run-report analog,
    * /root/reference/rules/factory_http.go:50-89). */
  def lineage(table: LakeTable): DataFrame = {
    val p = java.nio.file.Paths.get(s"${table.dir}/_lineage")
    if (java.nio.file.Files.isDirectory(p))
      table.spark.read.schema(lineageSchema).json(p.toString)
    else
      table.spark.createDataFrame(
        java.util.Collections.emptyList[Row](), lineageSchema)
  }
}
