package graft.lake

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Table maintenance: bucket compaction (small-file merging + tombstone GC)
  * and snapshot expiry (metadata + unreferenced-data cleanup).
  *
  * A copy-on-write table accretes files two ways: each commit rewrites its
  * affected buckets into a new commit dir (old versions keep the old files —
  * that's time travel), and a bucket written by K tasks holds K part files.
  * Compaction rewrites chosen buckets to single-file dirs and may drop
  * tombstones whose `_seq` is at or below a caller-supplied horizon (safe
  * once no replay can deliver events older than the horizon — tombstones
  * exist to absorb stale replays, see MergeApply).
  */
object Maintenance {

  final case class CompactionResult(bucketsCompacted: Int, tombstonesDropped: Long)

  /** Rewrite buckets whose data dir holds more than `maxFilesPerBucket`
    * parquet files (or all buckets, if `force`), dropping tombstones with
    * `_seq` <= tombstoneHorizon. Commits one new snapshot. */
  def compact(
      table: LakeTable,
      maxFilesPerBucket: Int = 1,
      tombstoneHorizon: Option[Long] = None,
      force: Boolean = false): CompactionResult = {
    val snap = table.snapshot
    val candidates: Set[Int] = snap.buckets.valuesIterator.filter { b =>
      force || fileCount(Paths.get(b.path)) > maxFilesPerBucket
    }.map(_.bucket).toSet
    if (candidates.isEmpty) return CompactionResult(0, 0L)

    val base = table.readInternal(snap, candidates)
    // count dropped tombstones in-flight with the rewrite (no second scan)
    val obs = org.apache.spark.sql.Observation(
      s"compact-${java.util.UUID.randomUUID()}")
    val isExpired = tombstoneHorizon match {
      case Some(h) => col(LakeTable.DeletedCol) && col(LakeTable.SeqCol) <= h
      case None => org.apache.spark.sql.functions.lit(false)
    }
    val kept = base
      .observe(obs, sum(when(isExpired, 1L).otherwise(0L)).as("dropped"))
      .filter(!isExpired)
    val routed = kept
      .withColumn("_bucket", table.bucketExpr(col("repo"), col("path")))
      .repartition(math.max(1, math.min(candidates.size,
        table.spark.conf.get("spark.sql.shuffle.partitions").toInt)), col("_bucket"))
    val commitDir = table.newCommitDataDir()
    routed.write.mode("overwrite").option("compression", "zstd")
      .partitionBy("_bucket").parquet(commitDir)
    val newBuckets = table.listWrittenBuckets(commitDir, snap.schemaId)
    val dropped = obs.get.get("dropped") match {
      case Some(v: java.lang.Long) => v.longValue()
      case Some(v: Long) => v
      case _ => 0L
    }
    table.commit(candidates, newBuckets, Map.empty,
      Map("compactions" -> 1L, "tombstonesExpired" -> dropped))
    CompactionResult(candidates.size, dropped)
  }

  /** Drop snapshot metadata older than the last `keep` versions and delete
    * data commit-dirs referenced by NO retained snapshot. Time travel remains
    * possible across retained versions only. */
  def expireSnapshots(table: LakeTable, keep: Int = 2): Int = {
    require(keep >= 1)
    val dir = Paths.get(table.dir)
    val snapDir = dir.resolve("snapshots")
    val versions = LakeTable.listDir(snapDir)
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
    val retained = versions.takeRight(keep)
    val expired = versions.dropRight(keep)

    // data dirs referenced by any retained snapshot (commit-dir granularity)
    val referenced: Set[Path] = retained.flatMap { v =>
      table.snapshotAt(v).buckets.valuesIterator.map(b => Paths.get(b.path).getParent)
    }.toSet
    val dataDir = dir.resolve("data")
    if (Files.isDirectory(dataDir)) {
      LakeTable.listDir(dataDir).foreach { commitDir =>
        if (!referenced.contains(commitDir))
          org.apache.commons.io.FileUtils.deleteQuietly(commitDir.toFile)
      }
    }
    expired.foreach(v => Files.deleteIfExists(snapDir.resolve(f"v$v%012d.json")))
    expired.size
  }

  private def fileCount(p: Path): Int =
    if (!Files.isDirectory(p)) 0
    else LakeTable.listDir(p).count(_.getFileName.toString.endsWith(".parquet"))
}
