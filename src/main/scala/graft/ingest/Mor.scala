package graft.ingest

import graft.lake.{LakeTable, MorRead}

/** Merge-on-read orchestration (the fold half; writes go through
  * [[MergeApply.appendDelta]], reads through [[graft.lake.MorRead]]).
  *
  * `fold` compacts the accumulated delta EVENT files into the base through
  * the ordinary COW merge — the same battle-tested path every batch uses —
  * and drops the folded delta files in the SAME atomic commit. After a fold
  * the table is a pure copy-on-write table again: file-pruned reads, compact
  * and rebucket all apply. This is the MOR contract at scale: streaming
  * writes cost O(batch); the deferred resolution cost is bounded by how
  * often fold runs (Hudi-MOR compaction cadence analog).
  */
object Mor {

  final case class FoldResult(deltaFilesFolded: Int, eventsFolded: Long)

  /** Fold all current delta files into the base. Safe beside a live MOR
    * tail: a concurrent append between our read and commit just wins the
    * version race — merge's optimistic retry re-runs against the refreshed
    * snapshot, and deltas appended AFTER our read survive in the manifest
    * (only the paths we folded are dropped).
    *
    * Fold is MOR's RESOLVE point, so the cross-batch DDL hold-back happens
    * here (appends are schema-agnostic and never hold back): winners whose
    * image fields the current schema cannot resolve are persisted to
    * `_pending` BEFORE their delta files are dropped, and re-apply through
    * `Ingest.drainPending` once the missing DDL lands. */
  def fold(table: LakeTable): FoldResult = {
    val snap = table.refresh()
    if (snap.deltaFiles.isEmpty) return FoldResult(0, 0L)
    val deltaPaths = snap.deltaFiles.map(_.path).toSet
    val winners = MorRead.deltaWinners(table, snap)
    val imageFields: Set[String] = winners.schema("after").dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSet
      case _ => Set.empty
    }
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
      alsoReplacePaths = deltaPaths)
    FoldResult(deltaPaths.size, r.eventsApplied)
  }
}
