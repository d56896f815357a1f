package graft.ingest

import graft.lake.{ChangeFeed, LakeTable}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Incremental downstream materialization — the medallion (bronze → silver)
  * shape: a DERIVED LakeTable kept in sync with a source LakeTable by
  * consuming the source's [[ChangeFeed]], never the upstream changelog and
  * never a source rescan.
  *
  * Each `sync` reads the net changes in `(cursor, srcHead]` and applies them
  * through the ordinary ingest merge ([[Ingest.applyBatch]]), so the derived
  * table gets the engine's full machinery for free: LWW, tombstones,
  * dead-letters, lineage, snapshot isolation — and its own change feed, so
  * chains compose (bronze → silver → gold).
  *
  * Exactly-once without new machinery: the batch is applied with
  * `batchId = srcHead VERSION`, and the chain cursor IS the destination's
  * committed batchId — a re-run of the same sync is the batchId fence's
  * exact no-op, and a crash between feed read and commit re-syncs from the
  * old cursor (the feed is deterministic over retained snapshots). Change
  * seqs ride through as the LWW seq, so overlapping windows converge.
  *
  * The destination belongs to its chain: mixing direct ingest into a chained
  * table would fight over the batchId fence (same contract as the
  * reference's one-rule-one-sink pairing, /root/reference/rules/factory.go).
  *
  * `rowFilter` derives a SUBSET table. Filter on change-immutable columns
  * (the key) for exact subset semantics; filtering on mutable columns has
  * the usual streaming-filter caveat (a row that LEAVES the predicate stops
  * updating rather than disappearing).
  */
object ChainApply {

  final case class ChainResult(
      fromVersion: Long, toVersion: Long, applied: Long, deadLetters: Long)

  /** One chain sync: apply the source's net changes since the last sync.
    * No-op (and cheap — two snapshot reads) when the source hasn't moved. */
  def sync(
      src: LakeTable, dst: LakeTable,
      rowFilter: Column = lit(true),
      cfg: Ingest.IngestConfig = Ingest.IngestConfig()): ChainResult = {
    val to = src.refresh().version
    val from = math.max(dst.refresh().committedBatchId, 0L)
    if (to <= from) return ChainResult(from, to, 0L, 0L)

    // schema catch-up BEFORE the feed batch: add source columns the
    // destination lacks (by name — the feed serves the source's CURRENT
    // names), so the merge binds every image field instead of dead-lettering
    val srcSchema = src.snapshotAt(to).schema
    srcSchema.columns.filter(c => dst.schema.find(c.name).isEmpty).foreach { c =>
      dst.evolveSchema(_.addColumn(c.name, c.dataType))
    }

    val feed = ChangeFeed.changesBetween(src, from, to).filter(rowFilter)
    // every feed column except the classification + seq is image payload
    val dataCols = feed.columns.filter(n => n != ChangeFeed.OpColName && n != "_seq")
    val img = struct(dataCols.map(col): _*)
    // null seq = a tombstone the window EXPIRED; the source head's maxSeq is
    // a safe LWW stamp (≥ every seq this key saw in the window, < every seq
    // any later window can deliver)
    val seq = coalesce(col("_seq"), lit(src.snapshotAt(to).maxSeq))
    val opC = col(ChangeFeed.OpColName)
    val batch = feed.select(
      lit(0).cast("int").as("partition"),
      seq.as("offset"),
      seq.as("seq"),
      lit(null).cast("timestamp").as("ts"),
      opC.as("op"),
      col("repo"), col("path"),
      when(opC.isin("update", "delete"), img).as("before"),
      when(opC =!= "delete", img).as("after"),
      lit(null).cast(graft.model.Schemas.ddlOp).as("ddl"))

    val bm = Ingest.applyBatch(dst, batch, batchId = to, cfg)
    ChainResult(from, to, bm.eventsApplied, bm.deadLetters)
  }
}
