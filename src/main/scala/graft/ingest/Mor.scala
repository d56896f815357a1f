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
    * (only the paths we folded are dropped). */
  def fold(table: LakeTable): FoldResult = {
    val snap = table.refresh()
    if (snap.deltaFiles.isEmpty) return FoldResult(0, 0L)
    val deltaPaths = snap.deltaFiles.map(_.path).toSet
    val winners = MorRead.deltaWinners(table, snap)
    val r = MergeApply.merge(table, winners, Map.empty,
      extraMetrics = Map("morFolds" -> 1L),
      alsoReplacePaths = deltaPaths)
    FoldResult(deltaPaths.size, r.eventsApplied)
  }
}
