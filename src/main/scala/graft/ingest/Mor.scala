package graft.ingest

import graft.lake.{DataFile, LakeTable, MorRead}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-on-read orchestration (the fold half; writes go through
  * [[MergeApply.appendDelta]], reads through [[graft.lake.MorRead]]).
  *
  * `fold` compacts the accumulated delta EVENT files into the base through
  * the ordinary COW merge — the same battle-tested path every batch uses —
  * and drops the folded delta files in the SAME atomic commit. After a full
  * fold the table is a pure copy-on-write table again: file-pruned reads,
  * compact and rebucket all apply. This is the MOR contract at scale:
  * streaming writes cost O(batch); the deferred resolution cost is bounded
  * by how often fold runs (Hudi-MOR compaction cadence analog).
  *
  * '''Partial (file-group) folds''' (`minEventsPerBucket > 0`) are the
  * 100 TB shape: a uniformly-scattered backlog touches ~every base file, so
  * an unconditional fold is a full-table rewrite — the one O(table)
  * operation a cadence-triggered fold must never be. Instead, only buckets
  * whose backlog has reached `minEventsPerBucket` events fold (their base
  * rewrite is then amortized over a worthwhile batch of keys — Hudi's
  * file-group compaction-scheduling shape); the remaining winners are
  * re-written as ONE compacted delta file and swapped in atomically with the
  * fold commit, so fold cost is proportional to the touched-bucket fraction
  * and read amplification still shrinks (N delta files → 1, raw events →
  * winners) even for the deferred part.
  */
object Mor {

  final case class FoldResult(
      deltaFilesFolded: Int, eventsFolded: Long,
      /** buckets whose base files were rewritten; -1 = unconditional fold. */
      bucketsFolded: Int = -1,
      /** winner rows deferred to the compacted remainder delta (partial). */
      eventsDeferred: Long = 0L)

  /** When no bucket reaches the partial-fold threshold, a fold tick still
    * compacts the delta LOG (winners-only rewrite, no base rewrite) once
    * this many delta files have accumulated — bounding read amplification
    * between real folds without paying any O(base) work. */
  val CompactDeltasMinFiles = 16

  /** Fold delta files into the base. Safe beside a live MOR tail: a
    * concurrent append between our read and commit just wins the version
    * race — merge's optimistic retry re-runs against the refreshed snapshot,
    * and deltas appended AFTER our read survive in the manifest (only the
    * paths we read are dropped; the unfolded remainder is re-added as a
    * compacted delta file in the same commit).
    *
    * Fold is MOR's RESOLVE point, so the cross-batch DDL hold-back happens
    * here (appends are schema-agnostic and never hold back): winners whose
    * image fields the current schema cannot resolve are persisted to
    * `_pending` BEFORE their delta files are dropped, and re-apply through
    * `Ingest.drainPending` once the missing DDL lands.
    *
    * @param minEventsPerBucket 0 = unconditional full fold (every winner
    *        merges into base — required before compact/rebucket and for
    *        final convergence); > 0 = partial fold, see class doc.
    */
  def fold(table: LakeTable, minEventsPerBucket: Long = 0L): FoldResult = {
    val snap = table.refresh()
    if (snap.deltaFiles.isEmpty) return FoldResult(0, 0L)
    val deltaPaths = snap.deltaFiles.map(_.path).toSet

    // ---- partial-fold scheduling: per-bucket backlog from ONE narrow scan
    // (repo+path only — column pruning keeps contents out) ----
    val backlogByBucket: Option[Map[Int, Long]] =
      if (minEventsPerBucket <= 0L) None
      else Some(table.spark.read
        .option("mergeSchema", "true")
        .parquet(snap.deltaFiles.map(f => table.resolve(f.path)): _*)
        .groupBy(table.bucketExpr(col("repo"), col("path")).as("_b"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)

    // One materialization of the winner aggregation: the merge below reads
    // `winners` at least twice (file selection + the merge job itself; three
    // times with a partial split), and re-running the delta scan + LWW
    // aggregate per consumer doubles the fold's IO. Winner cardinality is
    // per-key (not per-event) — bounded by the backlog's distinct keys — so
    // caching is driver-safe at any delta volume that fits the fold anyway.
    val winners = MorRead.deltaWinners(table, snap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fold0(table, snap, winners, minEventsPerBucket, backlogByBucket, deltaPaths)
    finally { winners.unpersist(blocking = false); () }
  }

  private def fold0(table: LakeTable, snap: graft.lake.Snapshot, winners: DataFrame,
      minEventsPerBucket: Long, backlogByBucket: Option[Map[Int, Long]],
      deltaPaths: Set[String]): FoldResult = {
    val imageFields: Set[String] = winners.schema("after").dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSet
      case _ => Set.empty
    }

    backlogByBucket match {
      case None => foldFull(table, winners, imageFields, deltaPaths)
      case Some(counts) =>
        val sel = counts.filter(_._2 >= minEventsPerBucket).keySet
        if (sel.isEmpty) {
          // nothing dense enough to be worth a base rewrite: compact the
          // delta log itself when it has fragmented, else no-op until the
          // backlog grows
          if (snap.deltaFiles.size < CompactDeltasMinFiles)
            FoldResult(0, 0L, bucketsFolded = 0, eventsDeferred = snap.deltaRows)
          else compactDeltaLog(table, winners, deltaPaths)
        } else if (sel.size == counts.size) {
          // every backlogged bucket is dense: the remainder is empty, so the
          // unconditional path is the same fold minus an empty write (base
          // cost is O(selected buckets) either way — file selection prunes
          // by the winners' keys)
          foldFull(table, winners, imageFields, deltaPaths)
            .copy(bucketsFolded = sel.size)
        } else {
          val bucketOf = table.bucketExpr(col("repo"), col("path"))
          val foldSide = winners.filter(bucketOf.isin(sel.toSeq: _*))
          val remainder = winners.filter(!bucketOf.isin(sel.toSeq: _*))
          val (remFiles, remRows) = writeDeltaCompact(table, remainder)
          val (resolvable, heldN) = Ingest.holdBack(table, foldSide, imageFields, -1L, 0)
          val extra = Map("morFolds" -> 1L, "morPartialFolds" -> 1L) ++
            (if (heldN > 0) Map("pendingHeldBack" -> heldN) else Map.empty)
          val r = MergeApply.merge(table, resolvable, Map.empty,
            extraMetrics = extra,
            alsoReplacePaths = deltaPaths,
            alsoNewDeltaFiles = remFiles)
          FoldResult(deltaPaths.size, r.eventsApplied,
            bucketsFolded = sel.size, eventsDeferred = remRows)
        }
    }
  }

  /** Unconditional fold — the pre-round-5 semantics. */
  private def foldFull(table: LakeTable, winners: DataFrame,
      imageFields: Set[String], deltaPaths: Set[String]): FoldResult = {
    // Empty-base fast selection (initial bulk load through MOR appends):
    // there are no base files to select against, so the selection scan would
    // only re-derive stats the delta manifests already carry — rows (an
    // upper bound on winners: hint only, it feeds the broadcast gate which
    // is moot with zero base files) and bytes — plus the bucket set, whose
    // sole use is sizing the write (capped by shuffle.partitions anyway).
    val snap = table.snapshot
    val emptyBaseSel =
      if (snap.files.nonEmpty) None
      else Some(MergeApply.FileSelection(Seq.empty,
        (0 until table.numBuckets).toSet, snap.deltaRows,
        snap.deltaFiles.iterator.map(_.bytes).sum))
    val (resolvable, heldN) = Ingest.holdBack(table, winners, imageFields, -1L, 0)
    val extra = Map("morFolds" -> 1L) ++
      (if (heldN > 0) Map("pendingHeldBack" -> heldN) else Map.empty)
    if (heldN > 0 && resolvable.isEmpty) {
      // every winner held back (schema fully behind): still drop the folded
      // delta files atomically — their rows are durably in _pending now
      graft.lake.LakeTable.withCommitRetry(table)(
        table.commit(deltaPaths, Seq.empty, Map.empty, extra))
      return FoldResult(deltaPaths.size, 0L)
    }
    val r = MergeApply.merge(table, resolvable, Map.empty,
      extraMetrics = extra,
      selection = emptyBaseSel,
      alsoReplacePaths = deltaPaths)
    FoldResult(deltaPaths.size, r.eventsApplied)
  }

  /** Winners-only rewrite of the delta log (no base rewrite): N fragmented
    * delta files become one compacted file of per-key winners. Read- and
    * fold-equivalent by construction — LWW resolution over {winners} equals
    * LWW over the raw events they were reduced from, and events in files
    * appended concurrently keep competing unchanged (max over a union
    * commutes with partial maxima). */
  private def compactDeltaLog(table: LakeTable, winners: DataFrame,
      deltaPaths: Set[String]): FoldResult = {
    val (files, rows) = writeDeltaCompact(table, winners)
    graft.lake.LakeTable.withCommitRetry(table)(
      table.commit(deltaPaths, Seq.empty, Map.empty,
        Map("deltaCompactions" -> 1L), newDeltaFiles = files))
    FoldResult(0, 0L, bucketsFolded = 0, eventsDeferred = rows)
  }

  /** Write a winners DataFrame as flat delta files; returns (manifest
    * entries, row count). Routed by the table's bucket function into at most
    * min(numBuckets, shuffle.partitions) partitions: without the route a
    * small remainder fragments across every shuffle partition of the winners
    * aggregation (defeating the compaction), and WITH it each output file
    * holds a hash-contiguous bucket subset — locality the next partial
    * fold's scheduling scan benefits from. Orphaned by a lost commit race
    * like any commit dir (swept by expireSnapshots past the grace window). */
  private def writeDeltaCompact(table: LakeTable, winners: DataFrame): (Seq[DataFile], Long) = {
    val shufflePartitions =
      table.spark.conf.get("spark.sql.shuffle.partitions").toInt
    val n = math.max(1, math.min(table.numBuckets, shufflePartitions))
    val dir = table.newCommitDataDir()
    winners.repartition(n, table.bucketExpr(col("repo"), col("path")))
      .write.mode("overwrite")
      .options(Map("compression" -> MergeApply.deltaFileCodec,
        "maxRecordsPerFile" -> table.snapshot.targetFileRows.toString))
      .parquet(dir)
    val files = table.listWrittenFilesFlat(dir, table.snapshot.schemaId)
    (files, files.iterator.map(_.rows).sum)
  }
}
