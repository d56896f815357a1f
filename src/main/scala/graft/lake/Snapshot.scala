package graft.lake

/** One data file in the manifest: a Parquet file holding rows of exactly one
  * bucket (bucket = pmod(hash(repo, path), numBuckets)), written under
  * `schemaId`, with min/max statistics over the rows' 64-bit key hash
  * `_hkey = xxhash64(repo, path)` taken from the Parquet footer.
  *
  * `path` is RELATIVE to the table root (so a table can be moved/symlinked
  * without invalidating its metadata — path-string comparisons during
  * maintenance stay sound).
  *
  * The (minKey, maxKey) range is the copy-on-write pruning unit: a merge
  * rewrites only files whose key range contains a delta key. Files written
  * sorted by `_hkey` and split at `targetFileRows` cover narrow, disjoint key
  * ranges, so a point update rewrites ~one file instead of a whole bucket —
  * the difference between O(batch) and O(table) write amplification at
  * 10^10-event scale.
  */
final case class DataFile(
    bucket: Int, path: String, schemaId: Int, rows: Long,
    minKey: Long, maxKey: Long,
    /** on-disk (compressed) file size — the byte input to broadcast-shape
      * gates ([[MorRead]]) and compaction scheduling; 0 = unknown (legacy
      * metadata), callers must fall back to a stat or the conservative
      * non-broadcast shape. */
    bytes: Long = 0L)

/** An immutable table snapshot. Commits are atomic: the snapshot JSON is
  * written to a tmp file (fsynced), then published via hard-link
  * creation-as-CAS — a concurrent committer of the same version loses with
  * FileAlreadyExistsException (optimistic concurrency).
  *
  * `fence` is the exactly-once high-water mark: log partition → highest
  * offset applied into this snapshot. It is the engine's durable, transactional
  * replacement for the reference's best-effort `t_positions` row
  * (/root/reference/cobra/cobra.go:18-20,144-169): because the fence commits
  * in the SAME atomic action as the data, replayed batches at-or-below the
  * fence are skipped and re-delivery is idempotent (fixes SURVEY §4.3.1).
  *
  * `metrics` is cumulative lineage (eventsApplied, tombstonesWritten,
  * conflictsLww, deadLetters, ...), the run-report analog of
  * /root/reference/rules/factory_http.go:50-89.
  */
final case class Snapshot(
    version: Long,
    parentVersion: Long,
    schemaId: Int,
    numBuckets: Int,
    files: Seq[DataFile],
    fence: Map[Int, Long],
    metrics: Map[String, Long],
    committedBatchId: Long,
    schemas: Seq[TableSchema],
    tsMillis: Long,
    /** high-water mark of applied DDL events' `seq` — schema evolution is
      * fenced exactly like data (a retried batch skips already-applied DDL,
      * which per-op checks cannot do for add→widen→rename chains). */
    ddlSeq: Long = -1L,
    /** GTID analog (/root/reference/cobra/cobra.go:18-20,83-85): the global
      * log sequence number of the newest row applied into this snapshot — a
      * single consistency token alongside the per-partition fence. */
    maxSeq: Long = -1L,
    /** writer splits output files at this many rows (sorted by `_hkey`), so
      * each file covers a narrow key range — the knob that makes min/max
      * pruning effective. */
    targetFileRows: Long = 1L << 20,
    /** Merge-on-read delta files (Hudi-MOR / Iceberg-v2 analog): bucketed
      * Parquet EVENT logs (repo, path, op, seq, after-image) appended by
      * streaming micro-batches in MOR mode for O(batch) write cost. Reads
      * resolve them against `files` by last-writer-wins at query time;
      * compaction folds them into base files through the ordinary COW merge
      * and drops them. Empty for pure copy-on-write tables. */
    deltaFiles: Seq[DataFile] = Seq.empty,
    /** SEGMENTED manifest pointers (Iceberg manifest-list analog; see
      * [[Manifest]]). Non-empty ⇒ the persisted snapshot carries ONLY these
      * references — `files`/`deltaFiles` above are the HYDRATED view, filled
      * from the (cached) manifest files at load time and equal to the
      * concatenation of base / delta manifests' entries in pointer order.
      * Empty ⇒ legacy inline snapshot (pre-segmentation tables, synthetic
      * test snapshots, the empty v0). */
    manifests: Seq[ManifestRef] = Seq.empty,
    /** Per-bucket event histogram of the FLAT (unlabeled, bucket = -1) delta
      * files — maintained transactionally so partial-fold SCHEDULING reads
      * the whole backlog off metadata, zero scans: appends ADD their batch
      * histogram (computed on the append job's existing Observation pass),
      * folds SUBTRACT the flat counts they consumed, and any commit that
      * leaves no flat delta file self-heals to Some(empty). None = unknown
      * (legacy metadata, or numBuckets above [[Snapshot.HistMaxBuckets]]) —
      * schedulers fall back to a narrow scan. Labeled delta files need no
      * histogram: their manifest entries carry (bucket, rows) directly.
      * Scheduling-only: an absent histogram can never lose data, folds
      * re-derive winners from the files themselves. */
    flatDeltaHist: Option[Map[Int, Long]] = None) {

  def schema: TableSchema = schemas.find(_.schemaId == schemaId).get
  def schemaById(id: Int): TableSchema = schemas.find(_.schemaId == id).get
  // segmented snapshots answer row counts from the pointer's manifest stats —
  // no entry hydration (the /report + metrics path must stay IO-free)
  def totalRows: Long =
    if (manifests.nonEmpty)
      manifests.iterator.filter(_.kind == Manifest.BaseKind).map(_.rows).sum
    else files.iterator.map(_.rows).sum
  def deltaRows: Long =
    if (manifests.nonEmpty)
      manifests.iterator.filter(_.kind == Manifest.DeltaKind).map(_.rows).sum
    else deltaFiles.iterator.map(_.rows).sum
  def filesOf(buckets: Set[Int]): Seq[DataFile] = files.filter(f => buckets.contains(f.bucket))

  /** The persisted pointer: segmented snapshots serialize manifest REFS, not
    * file entries — snapshot bytes are O(#manifests), and `/report` serves
    * position/lineage without inlining a million-file list. */
  def toJson: String = {
    val fileFields =
      if (manifests.nonEmpty)
        Seq("manifestList" -> Json.arrOf(manifests.map(_.toJson)))
      else Seq(
        "files" -> Json.arrOf(files.sortBy(f => (f.bucket, f.minKey, f.path)).map(Snapshot.fileJson)),
        "deltaFiles" -> Json.arrOf(deltaFiles.sortBy(f => (f.bucket, f.minKey, f.path)).map(Snapshot.fileJson)))
    Json.obj(Seq(
      "version" -> version.toString,
      "parentVersion" -> parentVersion.toString,
      "schemaId" -> schemaId.toString,
      "numBuckets" -> numBuckets.toString,
      "committedBatchId" -> committedBatchId.toString,
      "ddlSeq" -> ddlSeq.toString,
      "maxSeq" -> maxSeq.toString,
      "targetFileRows" -> targetFileRows.toString,
      "tsMillis" -> tsMillis.toString) ++
      flatDeltaHist.toSeq.map(h => "flatHist" -> Json.quote(
        h.toSeq.sorted.map { case (b, n) => s"$b:$n" }.mkString(","))) ++
      fileFields ++ Seq(
      "fence" -> Json.obj(fence.toSeq.sortBy(_._1).map { case (p, o) => p.toString -> o.toString }: _*),
      "metrics" -> Json.obj(metrics.toSeq.sorted.map { case (k, v) => k -> v.toString }: _*),
      "schemas" -> Json.arrOf(schemas.map(_.toJson))): _*)
  }

  /** Bind `files`/`deltaFiles` to LAZY views over the manifest files (no-op
    * for inline snapshots): entries are read only when something first plans
    * over them — a load, a fence-only commit, `/report` and the metrics
    * surface do ZERO manifest IO (and size/isEmpty gates answer from the
    * pointer's recorded counts). When entries ARE forced, IO cost is
    * O(manifests not yet in the process cache). Manifest EXISTENCE is
    * checked eagerly (cheap stats): the torn-crash fallback in
    * [[LakeTable.latestSnapshot]] must reject a pointer whose manifests were
    * lost with it at LOAD time, not at first use deep inside a query. */
  def hydrate(tableDir: String): Snapshot =
    if (manifests.isEmpty) this
    else {
      manifests.foreach { r =>
        val p = java.nio.file.Paths.get(tableDir).resolve(r.path)
        if (!java.nio.file.Files.isRegularFile(p))
          throw new java.io.IOException(s"manifest missing: ${r.path}")
        // stat-level integrity (no read): a torn/truncated manifest has the
        // wrong length; same-length corruption still surfaces (as a parse
        // error) at first entry access
        if (r.bytes > 0L && java.nio.file.Files.size(p) != r.bytes)
          throw new java.io.IOException(
            s"manifest torn: ${r.path} (${java.nio.file.Files.size(p)} bytes, expected ${r.bytes})")
      }
      copy(
        files = new Manifest.LazyEntries(tableDir,
          manifests.filter(_.kind == Manifest.BaseKind)),
        deltaFiles = new Manifest.LazyEntries(tableDir,
          manifests.filter(_.kind == Manifest.DeltaKind)))
    }
}

object Snapshot {
  private[lake] def fileJson(f: DataFile): String = Json.obj(
    "bucket" -> f.bucket.toString,
    "path" -> Json.quote(f.path),
    "schemaId" -> f.schemaId.toString,
    "rows" -> f.rows.toString,
    "minKey" -> f.minKey.toString,
    "maxKey" -> f.maxKey.toString,
    "bytes" -> f.bytes.toString)

  private[lake] def fileFromJson(f: com.fasterxml.jackson.databind.JsonNode): DataFile =
    DataFile(Json.int(f, "bucket"), Json.str(f, "path"), Json.int(f, "schemaId"),
      Json.long(f, "rows"), Json.long(f, "minKey"), Json.long(f, "maxKey"),
      bytes = if (f.has("bytes")) Json.long(f, "bytes") else 0L)

  def fromJson(s: String): Snapshot = {
    val n = Json.parse(s)
    Snapshot(
      version = Json.long(n, "version"),
      parentVersion = Json.long(n, "parentVersion"),
      schemaId = Json.int(n, "schemaId"),
      numBuckets = Json.int(n, "numBuckets"),
      files = Json.arr(n, "files").map(fileFromJson),
      deltaFiles =
        if (n.has("deltaFiles")) Json.arr(n, "deltaFiles").map(fileFromJson) else Seq.empty,
      manifests =
        if (n.has("manifestList")) Json.arr(n, "manifestList").map(Manifest.refFromJson)
        else Seq.empty,
      fence = Json.objFields(n, "fence").map { case (k, v) => k.toInt -> v.asLong() }.toMap,
      metrics = Json.objFields(n, "metrics").map { case (k, v) => k -> v.asLong() }.toMap,
      committedBatchId = Json.long(n, "committedBatchId"),
      schemas = Json.arr(n, "schemas").map(TableSchema.fromJsonNode),
      tsMillis = Json.long(n, "tsMillis"),
      ddlSeq = if (n.has("ddlSeq")) Json.long(n, "ddlSeq") else -1L,
      maxSeq = if (n.has("maxSeq")) Json.long(n, "maxSeq") else -1L,
      targetFileRows = if (n.has("targetFileRows")) Json.long(n, "targetFileRows") else 1L << 20,
      flatDeltaHist =
        if (!n.has("flatHist")) None
        else Some(Json.str(n, "flatHist").split(',').iterator.filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf(':')
          kv.substring(0, i).toInt -> kv.substring(i + 1).toLong
        }.toMap))
  }

  /** Ceiling on per-append histogram width: above this bucket count the
    * observe-pass conditional sums stop being cheap and the snapshot field
    * stops being small, so the histogram is disabled (None) and schedulers
    * scan instead. */
  val HistMaxBuckets = 256
}

/** How a commit updates [[Snapshot.flatDeltaHist]]. Add/Sub are RELATIVE
  * (merged against the snapshot the commit finally lands on), so they stay
  * correct across optimistic-concurrency retries and append/fold races:
  * a fold subtracts exactly what it read, never zeroing counts a racing
  * append added after the fold's snapshot. */
sealed trait FlatHistOp
object FlatHistOp {
  /** Commit does not touch flat delta files. */
  case object Keep extends FlatHistOp
  /** Commit appends flat delta files carrying this per-bucket event
    * histogram; None = histogram unavailable for this batch (bucket count
    * over [[Snapshot.HistMaxBuckets]]) — poisons the running total to
    * unknown until the next full sweep of flat files heals it. */
  final case class Add(hist: Option[Map[Int, Long]]) extends FlatHistOp
  /** Commit consumed flat delta files whose histogram at read time was
    * `hist` (every fold/compaction reads ALL flat files of ITS snapshot). */
  final case class Sub(hist: Map[Int, Long]) extends FlatHistOp
}
