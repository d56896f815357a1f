package graft.lake

/** One bucket's data at a given snapshot: a directory of Parquet files, all
  * written under `schemaId`. The bucket (pmod(hash(repo, path), numBuckets))
  * is the unit of copy-on-write rewrite and of merge-time pruning.
  */
final case class BucketFile(bucket: Int, path: String, schemaId: Int, rows: Long)

/** An immutable table snapshot. Commits are atomic (tmp file + ATOMIC_MOVE
  * rename; a concurrent committer of the same version loses with
  * FileAlreadyExistsException — optimistic concurrency).
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
    buckets: Map[Int, BucketFile],
    fence: Map[Int, Long],
    metrics: Map[String, Long],
    committedBatchId: Long,
    schemas: Seq[TableSchema],
    tsMillis: Long,
    /** high-water mark of applied DDL events' `seq` — schema evolution is
      * fenced exactly like data (a retried batch skips already-applied DDL,
      * which per-op checks cannot do for add→widen→rename chains). */
    ddlSeq: Long = -1L) {

  def schema: TableSchema = schemas.find(_.schemaId == schemaId).get
  def schemaById(id: Int): TableSchema = schemas.find(_.schemaId == id).get
  def totalRows: Long = buckets.valuesIterator.map(_.rows).sum

  def toJson: String = Json.obj(
    "version" -> version.toString,
    "parentVersion" -> parentVersion.toString,
    "schemaId" -> schemaId.toString,
    "numBuckets" -> numBuckets.toString,
    "committedBatchId" -> committedBatchId.toString,
    "ddlSeq" -> ddlSeq.toString,
    "tsMillis" -> tsMillis.toString,
    "buckets" -> Json.arrOf(buckets.toSeq.sortBy(_._1).map { case (_, b) =>
      Json.obj(
        "bucket" -> b.bucket.toString,
        "path" -> Json.quote(b.path),
        "schemaId" -> b.schemaId.toString,
        "rows" -> b.rows.toString)
    }),
    "fence" -> Json.obj(fence.toSeq.sortBy(_._1).map { case (p, o) => p.toString -> o.toString }: _*),
    "metrics" -> Json.obj(metrics.toSeq.sorted.map { case (k, v) => k -> v.toString }: _*),
    "schemas" -> Json.arrOf(schemas.map(_.toJson)))
}

object Snapshot {
  def fromJson(s: String): Snapshot = {
    val n = Json.parse(s)
    Snapshot(
      version = Json.long(n, "version"),
      parentVersion = Json.long(n, "parentVersion"),
      schemaId = Json.int(n, "schemaId"),
      numBuckets = Json.int(n, "numBuckets"),
      buckets = Json.arr(n, "buckets").map { b =>
        val bf = BucketFile(Json.int(b, "bucket"), Json.str(b, "path"), Json.int(b, "schemaId"), Json.long(b, "rows"))
        bf.bucket -> bf
      }.toMap,
      fence = Json.objFields(n, "fence").map { case (k, v) => k.toInt -> v.asLong() }.toMap,
      metrics = Json.objFields(n, "metrics").map { case (k, v) => k -> v.asLong() }.toMap,
      committedBatchId = Json.long(n, "committedBatchId"),
      schemas = Json.arr(n, "schemas").map(TableSchema.fromJsonNode),
      tsMillis = Json.long(n, "tsMillis"),
      ddlSeq = if (n.has("ddlSeq")) Json.long(n, "ddlSeq") else -1L)
  }
}
