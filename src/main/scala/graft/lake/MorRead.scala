package graft.lake

import graft.model.Ops
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Merge-on-read resolution (the read half of MOR mode; the write half is
  * `MergeApply.appendDelta`, the fold is `Mor.fold`).
  *
  * Delta files are bucketed EVENT logs: (repo, path, op, seq, after-image).
  * A read resolves them against the base files with exactly the COW merge's
  * semantics — last-writer-wins on `seq` (strictly greater beats base; equal
  * is a duplicate and base stands), winning deletes suppress the row,
  * winning updates take image-bound columns from the after-image and
  * PRESERVE uncarried columns from the base row (the same rename-safe
  * [[ImageBinding]] both paths share). MorSpec asserts read-resolution ==
  * COW result on identical inputs, including the uncarried-column and
  * stale-replay-tombstone cases, and that both physical shapes below agree.
  *
  * Two physical shapes, mirroring the COW merge's strategy choice:
  *  - '''broadcast''' (delta winners ≤ [[graft lake broadcast threshold]] —
  *    the common between-folds state, bounded by `snapshot.deltaRows`):
  *    base LEFT OUTER broadcast(delta) + keys-only anti-join insert residue.
  *    The base is NEVER shuffled — at 100 TB the read costs one base scan
  *    plus a broadcast, not a table-wide exchange.
  *  - '''full-outer shuffle''' for large unfolded backlogs (full-outer
  *    broadcast joins are unsupported in Spark, so both sides exchange on
  *    the key).
  * Read amplification overall is bounded by fold cadence (fold turns this
  * whole resolution into the ordinary bucket-aligned COW merge).
  */
object MorRead {

  /** Above this many delta EVENT rows (an upper bound on distinct winners,
    * known exactly from the snapshot — no counting job) the broadcast shape
    * is abandoned. Same sizing rationale as MergeApply.BroadcastDeltaMaxRows. */
  val BroadcastWinnersMaxRows = 100000L

  /** Above this many delta BYTES (on-disk compressed, from the manifest) the
    * broadcast shape is abandoned regardless of row count — the same
    * semantics as the COW merge's [[graft.ingest.MergeApply.BroadcastDeltaMaxBytes]]
    * gate (a row-count gate alone lets 100k events of 1 MB contents build a
    * ~100 GB broadcast and OOM every executor on every MOR read). */
  val BroadcastDeltaMaxBytes: Long = graft.ingest.MergeApply.BroadcastDeltaMaxBytes

  /** Total on-disk bytes of a snapshot's delta files. Manifest `bytes` when
    * recorded; legacy entries (bytes=0) fall back to a driver-cheap stat; a
    * failed stat counts as effectively-infinite, so unknown sizes degrade to
    * the safe (non-broadcast) shape, never to an OOM. */
  def deltaBytes(table: LakeTable, s: Snapshot): Long =
    s.deltaFiles.iterator.map { f =>
      if (f.bytes > 0L) f.bytes
      else
        try java.nio.file.Files.size(java.nio.file.Paths.get(table.resolve(f.path)))
        catch { case _: java.io.IOException => Long.MaxValue / 1024 }
    }.foldLeft(0L)((a, b) => if (a + b < 0) Long.MaxValue else a + b)

  /** The deduped winning event per key across all delta files. */
  def deltaWinners(table: LakeTable, s: Snapshot): DataFrame =
    deltaWinnersOf(table, s.deltaFiles)

  /** Winners over a SUBSET of delta files (partial-fold file-group pruning:
    * `Mor.foldPartial` reads only the flat append files plus the compacted
    * per-bucket files of the buckets it folds). LWW over a subset is exact
    * for the keys it covers as long as the caller folds only rows routed to
    * buckets whose every delta file is IN the subset — max over a union
    * commutes with partial maxima, so events left in kept-out files keep
    * competing at read/fold time unchanged. */
  def deltaWinnersOf(table: LakeTable, files: Seq[DataFile]): DataFrame = {
    val spark = table.spark
    val events = spark.read
      .option("mergeSchema", "true") // image struct may gain fields across batches
      .parquet(files.map(f => table.resolve(f.path)): _*)
      .select(col("repo"), col("path"), col("op"), col("seq"), col("after"))
    events
      .groupBy(col("repo"), col("path"))
      .agg(graft.functions.LastWriterAgg.lastWriter(
        struct(col("op"), col("seq"), col("after")), col("seq")).as("_w"))
      .select(col("repo"), col("path"),
        col("_w.op").as("op"), col("_w.seq").as("seq"), col("_w.after").as("after"))
  }

  /** Current rows of a MOR snapshot: base resolved against deduped deltas. */
  def resolve(table: LakeTable, s: Snapshot,
      broadcastMaxRows: Long = BroadcastWinnersMaxRows,
      broadcastMaxBytes: Long = BroadcastDeltaMaxBytes): DataFrame = {
    val sch = s.schema
    val d0 = deltaWinners(table, s)
    val imageFields: Set[String] = d0.schema("after").dataType match {
      case st: StructType => st.fieldNames.toSet
      case _ => Set.empty
    }
    val (imageBinding, _) = ImageBinding.bind(s, imageFields)
    def imageField(c: String): Option[String] = imageBinding.get(c)

    val isDel = col("d.op") === Ops.Delete

    /** The COW merge's column resolution; `bCol` abstracts over whether a
      * base row exists (join-matched) or is known absent (insert residue). */
    def outCols(bCol: String => Column, dWins: Column, baseSeq: Column): Seq[Column] =
      sch.columns.map { c =>
        val tp = TableSchema.toSpark(c.dataType)
        if (c.name == "repo" || c.name == "path")
          coalesce(col(s"d.${c.name}"), bCol(c.name)).as(c.name)
        else imageField(c.name) match {
          case Some(f) =>
            when(dWins && !isDel, col(s"d.after.$f").cast(tp))
              .when(dWins && isDel, lit(null).cast(tp))
              .otherwise(bCol(c.name)).as(c.name)
          case None => // column not carried by the image: preserve current value
            when(dWins && isDel, lit(null).cast(tp))
              .otherwise(bCol(c.name)).as(c.name)
        }
      } ++ Seq(
        when(dWins, col("d.seq")).otherwise(baseSeq).as(LakeTable.SeqCol),
        when(dWins, isDel).otherwise(coalesce(bCol(LakeTable.DeletedCol), lit(false)))
          .as(LakeTable.DeletedCol))

    val b = table.readInternal(s, s.files).alias("b")
    val d = d0.alias("d")
    val baseSeq = col(s"b.${LakeTable.SeqCol}")
    val dWins = col("d.seq").isNotNull && (baseSeq.isNull || col("d.seq") > baseSeq)
    val keyCond = col("b.repo") === col("d.repo") && col("b.path") === col("d.path")

    val resolvedInternal =
      if (s.deltaRows <= broadcastMaxRows && deltaBytes(table, s) <= broadcastMaxBytes) {
        // broadcast shape: the base side keeps its scan partitioning (no
        // exchange); full-outer is decomposed into matched + insert residue
        // exactly like the COW merge's broadcast-incremental strategy
        val matched = b.join(broadcast(d), keyCond, "left_outer")
          .select(outCols(n => col(s"b.$n"), dWins, baseSeq): _*)
        val baseKeys = table.readInternal(s, s.files).select(col("repo"), col("path"))
        val inserts = d0.join(baseKeys, Seq("repo", "path"), "left_anti").alias("d")
          .select(outCols(n => lit(null), lit(true), lit(null).cast("long")): _*)
        matched.unionByName(inserts)
      } else {
        b.join(d, keyCond, "full_outer")
          .select(outCols(n => col(s"b.$n"), dWins, baseSeq): _*)
      }

    resolvedInternal
      .filter(!col(LakeTable.DeletedCol))
      .select(sch.columns.map(c => col(c.name)): _*)
  }
}
