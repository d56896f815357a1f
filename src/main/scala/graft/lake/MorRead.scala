package graft.lake

import graft.model.Ops
import org.apache.spark.sql.DataFrame
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
  * stale-replay-tombstone cases.
  *
  * Scale shape: base scans stay pruned/columnar; the delta side is bounded
  * by compaction cadence (fold turns this whole resolution into the ordinary
  * bucket-aligned COW merge). The full-outer join shuffles both sides by the
  * join key at read time — the read-amplification HALF of the MOR tradeoff,
  * paid to make streaming writes O(batch) instead of O(touched files).
  */
object MorRead {

  /** The deduped winning event per key across all delta files. */
  def deltaWinners(table: LakeTable, s: Snapshot): DataFrame = {
    val spark = table.spark
    val events = spark.read
      .option("mergeSchema", "true") // image struct may gain fields across batches
      .parquet(s.deltaFiles.map(f => table.resolve(f.path)): _*)
      .select(col("repo"), col("path"), col("op"), col("seq"), col("after"))
    events
      .groupBy(col("repo"), col("path"))
      .agg(graft.functions.LastWriterAgg.lastWriter(
        struct(col("op"), col("seq"), col("after")), col("seq")).as("_w"))
      .select(col("repo"), col("path"),
        col("_w.op").as("op"), col("_w.seq").as("seq"), col("_w.after").as("after"))
  }

  /** Current rows of a MOR snapshot: base ⟗ deduped-deltas, resolved. */
  def resolve(table: LakeTable, s: Snapshot): DataFrame = {
    val sch = s.schema
    val d0 = deltaWinners(table, s)
    val imageFields: Set[String] = d0.schema("after").dataType match {
      case st: StructType => st.fieldNames.toSet
      case _ => Set.empty
    }
    val (imageBinding, _) = ImageBinding.bind(s, imageFields)
    def imageField(c: String): Option[String] = imageBinding.get(c)

    val b = table.readInternal(s, s.files).alias("b")
    val d = d0.alias("d")
    val joined = b.join(d,
      col("b.repo") === col("d.repo") && col("b.path") === col("d.path"),
      "full_outer")

    val baseSeq = col(s"b.${LakeTable.SeqCol}")
    val dWins = col("d.seq").isNotNull && (baseSeq.isNull || col("d.seq") > baseSeq)
    val isDel = col("d.op") === Ops.Delete
    val outCols = sch.columns.map { c =>
      val tp = TableSchema.toSpark(c.dataType)
      if (c.name == "repo" || c.name == "path")
        coalesce(col(s"d.${c.name}"), col(s"b.${c.name}")).as(c.name)
      else imageField(c.name) match {
        case Some(f) =>
          when(dWins && !isDel, col(s"d.after.$f").cast(tp))
            .when(dWins && isDel, lit(null).cast(tp))
            .otherwise(col(s"b.${c.name}")).as(c.name)
        case None => // column not carried by the image: preserve current value
          when(dWins && isDel, lit(null).cast(tp))
            .otherwise(col(s"b.${c.name}")).as(c.name)
      }
    } ++ Seq(
      when(dWins, col("d.seq")).otherwise(baseSeq).as(LakeTable.SeqCol),
      when(dWins, isDel).otherwise(coalesce(col(s"b.${LakeTable.DeletedCol}"), lit(false)))
        .as(LakeTable.DeletedCol))

    joined.select(outCols: _*)
      .filter(!col(LakeTable.DeletedCol))
      .select(sch.columns.map(c => col(c.name)): _*)
  }
}
