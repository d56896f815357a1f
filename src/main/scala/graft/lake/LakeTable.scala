package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** From-scratch snapshot-isolated table format ("LakeTable") providing the
  * Iceberg semantics the north rule requires — no Iceberg/Delta runtime is
  * available offline (SURVEY §7.1), so snapshot log, atomic commit, offset
  * fencing, schema evolution and time travel are implemented here over plain
  * Parquet.
  *
  * Layout:
  * {{{
  *   <dir>/snapshots/v000000000001.json   // snapshot log (atomic rename commit)
  *   <dir>/data/c<version>-<uuid>/_bucket=N/part-*.parquet
  * }}}
  *
  * Data is hash-bucketed on the logical key (repo, path):
  * bucket = pmod(hash(repo, path), numBuckets). The bucket is simultaneously
  *  - the pruning unit (a delta's affected buckets are computable from its
  *    keys alone — no file-stat reads),
  *  - the copy-on-write rewrite unit, and
  *  - the shuffle alignment for the merge join (both sides repartitioned by
  *    the same function ⇒ co-located, skew-free since hot repos spread over
  *    all buckets via the path component of the hash).
  *
  * Every data file carries two internal columns beyond the user schema:
  * `_seq` (log sequence number of the last writer — LWW conflict resolution)
  * and `_deleted` (tombstone flag; tombstones keep `_seq` so that a stale,
  * replayed update can never resurrect a deleted row — convergence is then
  * order-independent, fixing the reference's worker-pool reordering hazard,
  * SURVEY §4.3.2).
  */
class LakeTable private (val spark: SparkSession, val dir: String, @volatile private var snap: Snapshot) {

  def snapshot: Snapshot = snap
  def schema: TableSchema = snap.schema
  def numBuckets: Int = snap.numBuckets

  /** Re-read the latest committed snapshot from disk. */
  def refresh(): Snapshot = {
    snap = LakeTable.latestSnapshot(dir).getOrElse(snap)
    snap
  }

  def snapshotAt(version: Long): Snapshot =
    Snapshot.fromJson(Files.readString(LakeTable.snapshotPath(dir, version)))

  /** bucket assignment for a (repo, path) key — Spark's Murmur3 `hash` is
    * deterministic across sessions, so bucketing is stable for the table's
    * lifetime. */
  def bucketExpr(repo: Column, path: Column): Column =
    pmod(hash(repo, path), lit(snap.numBuckets))

  /** Public read: current rows under the current schema (tombstones and
    * internal columns hidden). */
  def read(): DataFrame = read(snap)

  def read(s: Snapshot): DataFrame =
    readInternal(s, s.buckets.keySet)
      .filter(!col("_deleted"))
      .select(s.schema.columns.map(c => col(c.name)): _*)

  /** Internal read of selected buckets: current-schema columns + _seq +
    * _deleted, tombstones included. Old-schema files are mapped to the
    * current schema BY COLUMN ID (rename-safe) with Catalyst-safe casts
    * (widen-safe); columns missing from a file read as null. */
  def readInternal(s: Snapshot, buckets: Set[Int]): DataFrame = {
    val cur = s.schema
    val groups = s.buckets.valuesIterator
      .filter(b => buckets.contains(b.bucket))
      .toSeq.groupBy(_.schemaId)
    val parts = groups.toSeq.sortBy(_._1).map { case (schemaId, files) =>
      val fileSchema = s.schemaById(schemaId)
      val projection = cur.columns.map { c =>
        fileSchema.findById(c.id) match {
          case Some(fc) => col(fc.name).cast(TableSchema.toSpark(c.dataType)).as(c.name)
          case None => lit(null).cast(TableSchema.toSpark(c.dataType)).as(c.name)
        }
      } ++ Seq(col("_seq"), col("_deleted"))
      spark.read
        .schema(StructType(fileSchema.sparkType.fields ++ LakeTable.internalFields))
        .parquet(files.map(_.path): _*)
        .select(projection: _*)
    }
    parts.reduceOption(_ unionByName _).getOrElse(emptyInternal(cur))
  }

  private def emptyInternal(cur: TableSchema): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(cur.sparkType.fields ++ LakeTable.internalFields))

  /** Atomically commit a new snapshot: replace `replacedBuckets` with
    * `newBuckets`, merge the offset fence, add metric deltas, optionally move
    * to an evolved schema. Optimistic concurrency: losing a version race
    * throws CommitConflictException (caller may refresh + retry).
    */
  def commit(
      replacedBuckets: Set[Int],
      newBuckets: Seq[BucketFile],
      fenceDelta: Map[Int, Long],
      metricsDelta: Map[String, Long],
      batchId: Long = -1L,
      newSchema: Option[TableSchema] = None,
      ddlSeq: Long = -1L): Snapshot = {
    val cur = snap
    val schemas =
      newSchema match {
        case Some(ns) =>
          require(ns.schemaId > cur.schemaId, "schema id must advance")
          cur.schemas :+ ns
        case None => cur.schemas
      }
    val mergedFence = (cur.fence.keySet ++ fenceDelta.keySet).map { p =>
      p -> math.max(cur.fence.getOrElse(p, -1L), fenceDelta.getOrElse(p, -1L))
    }.toMap
    val mergedMetrics = (cur.metrics.keySet ++ metricsDelta.keySet).map { k =>
      k -> (cur.metrics.getOrElse(k, 0L) + metricsDelta.getOrElse(k, 0L))
    }.toMap
    val next = Snapshot(
      version = cur.version + 1,
      parentVersion = cur.version,
      schemaId = newSchema.map(_.schemaId).getOrElse(cur.schemaId),
      numBuckets = cur.numBuckets,
      buckets = (cur.buckets -- replacedBuckets) ++ newBuckets.map(b => b.bucket -> b),
      fence = mergedFence,
      metrics = mergedMetrics,
      committedBatchId = math.max(batchId, cur.committedBatchId),
      schemas = schemas,
      tsMillis = System.currentTimeMillis(),
      ddlSeq = math.max(ddlSeq, cur.ddlSeq))
    LakeTable.writeSnapshotAtomic(dir, next)
    snap = next
    next
  }

  /** Schema-only evolution commit (DDL barrier, SURVEY §3.2). `ddlSeq` is
    * the applied DDL event's log seq — the schema-evolution fence. */
  def evolveSchema(f: TableSchema => TableSchema, ddlSeq: Long = -1L): Snapshot =
    commit(Set.empty, Seq.empty, Map.empty, Map.empty, newSchema = Some(f(schema)),
      ddlSeq = ddlSeq)

  /** Directory for a new commit's data files. */
  def newCommitDataDir(): String = {
    val p = Paths.get(dir, "data", s"c${snap.version + 1}-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.createDirectories(p)
    p.toString
  }

  /** List the `_bucket=N` dirs written under a commit data dir and build
    * BucketFile entries. Row counts come from parquet footers (driver-side
    * metadata reads — no Spark job; at real cluster scale this would be a
    * small parallel metadata task, as in Iceberg manifests). */
  def listWrittenBuckets(commitDir: String, schemaId: Int): Seq[BucketFile] = {
    val dirs = LakeTable.listDir(Paths.get(commitDir))
      .filter(p => p.getFileName.toString.startsWith("_bucket="))
    // footer reads are independent metadata fetches — do them concurrently
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = LakeTable.metaPool
    val futures = dirs.map { p =>
      Future {
        val b = p.getFileName.toString.stripPrefix("_bucket=").toInt
        val rows = LakeTable.listDir(p)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => parquetRowCount(f))
          .sum
        BucketFile(b, p.toString, schemaId, rows)
      }
    }
    Await.result(Future.sequence(futures), Duration.Inf)
  }

  private def parquetRowCount(file: Path): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getRecordCount finally reader.close()
  }
}

class CommitConflictException(msg: String) extends RuntimeException(msg)

object LakeTable {
  private[lake] lazy val metaPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(16,
        (r: Runnable) => { val t = new Thread(r, "lake-meta"); t.setDaemon(true); t }))

  val SeqCol = "_seq"
  val DeletedCol = "_deleted"
  val internalFields: Array[StructField] = Array(
    StructField(SeqCol, LongType, nullable = false),
    StructField(DeletedCol, BooleanType, nullable = false))

  private def snapshotsDir(dir: String): Path = Paths.get(dir, "snapshots")
  private[lake] def snapshotPath(dir: String, version: Long): Path =
    snapshotsDir(dir).resolve(f"v$version%012d.json")

  private[lake] def writeSnapshotAtomic(dir: String, s: Snapshot): Unit = {
    val snapDir = snapshotsDir(dir)
    Files.createDirectories(snapDir)
    val tmp = snapDir.resolve(s"_tmp-${java.util.UUID.randomUUID()}.json")
    Files.writeString(tmp, s.toJson)
    // Atomic compare-and-set publish: a POSIX rename silently REPLACES an
    // existing target, so ATOMIC_MOVE cannot detect a version race. Hard-link
    // creation is atomic and fails with FileAlreadyExistsException if the
    // version was committed concurrently — the loser must refresh and retry.
    try {
      Files.createLink(snapshotPath(dir, s.version), tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new CommitConflictException(s"version ${s.version} already committed by a concurrent writer")
    }
  }

  private[lake] def latestSnapshot(dir: String): Option[Snapshot] = {
    val sd = snapshotsDir(dir)
    if (!Files.isDirectory(sd)) return None
    val latest = listDir(sd)
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .sorted.lastOption
    latest.map(n => Snapshot.fromJson(Files.readString(sd.resolve(n))))
  }

  /** Files.list with guaranteed stream close (each open stream holds a
    * directory fd; the per-commit hot path must not leak them). */
  private[graft] def listDir(p: Path): Seq[Path] =
    scala.util.Using.resource(Files.list(p))(_.iterator().asScala.toSeq)

  def create(spark: SparkSession, dir: String, numBuckets: Int = 64,
      schema: TableSchema = TableSchema.base): LakeTable = {
    val s0 = Snapshot(
      version = 0L, parentVersion = -1L, schemaId = schema.schemaId,
      numBuckets = numBuckets, buckets = Map.empty, fence = Map.empty,
      metrics = Map.empty, committedBatchId = -1L, schemas = Seq(schema),
      tsMillis = System.currentTimeMillis(), ddlSeq = -1L)
    writeSnapshotAtomic(dir, s0)
    new LakeTable(spark, dir, s0)
  }

  def load(spark: SparkSession, dir: String): LakeTable =
    new LakeTable(spark, dir, latestSnapshot(dir).getOrElse(
      throw new IllegalArgumentException(s"not a LakeTable: $dir")))

  def exists(dir: String): Boolean = latestSnapshot(dir).isDefined
}
