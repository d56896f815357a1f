package graft.model

import org.apache.spark.sql.types._

/** Target-table row, per the north rule's input hint: a file inside a
  * source-code repository. Logical primary key = (repo, path).
  */
case class RepoRow(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Schema-evolution operation carried by a DDL event.
  *
  * The reference forwards raw `ALTER TABLE` SQL verbatim
  * (/root/reference/event/functions.go:42-61,
  * /root/reference/event/sql_maker.go:72-78); the engine instead models the
  * three evolutions the north rule names as typed ops.
  *
  * kind ∈ {add_column, rename_column, widen_type}.
  */
case class DdlOp(
    kind: String,
    column: String,
    newName: String,
    fromType: String,
    toType: String)

/** Normalized change event — the engine's single core datum.
  *
  * Modeled on the reference's `event.Event`
  * (/root/reference/event/event.go:28-35): `Type`/`Action` collapse into
  * `op`; the positional `RawData [][]interface{}` before/after images
  * (arity rules at /root/reference/event/event.go:171-212) become typed
  * nested structs — insert carries `after`, delete carries `before`,
  * update carries both, ddl carries `ddl`.
  *
  * (partition, offset) addresses the event in the durable log (the binlog
  * `(file, pos)` analog, /root/reference/cobra/cobra.go:18-20); `seq` is the
  * global log sequence number used for last-writer-wins conflict resolution.
  */
case class ChangeEvent(
    partition: Int,
    offset: Long,
    seq: Long,
    ts: java.sql.Timestamp,
    op: String,
    repo: String,
    path: String,
    before: Option[RepoRow],
    after: Option[RepoRow],
    ddl: Option[DdlOp])

object Ops {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val Ddl = "ddl"
  /** Row-change ops (the reference's OnRow actions,
    * /root/reference/event/event.go:179-196). */
  val rowOps: Set[String] = Set(Insert, Update, Delete)
  val all: Set[String] = rowOps + Ddl
}

object Schemas {
  val repoRow: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lang", StringType),
    StructField("content", StringType)))

  val ddlOp: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("column", StringType),
    StructField("newName", StringType),
    StructField("fromType", StringType),
    StructField("toType", StringType)))

  /** Explicit changelog schema — used by the streaming reader (file stream
    * sources require a user-supplied schema).
    */
  val changeEvent: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("ts", TimestampType),
    StructField("op", StringType),
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("before", repoRow),
    StructField("after", repoRow),
    StructField("ddl", ddlOp)))
}
