package graft.ingest

import graft.model.Ops
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event validation — the reference's `Event.IsLegal` arity rules
  * (/root/reference/event/event.go:171-212): action must be a known op;
  * insert/delete carry exactly one row image, update two; DDL must carry its
  * payload. Invalid events never fail the stream: they are shunted to a
  * dead-letter side output with the reason in-band, matching the reference's
  * skip-and-report policy (`Event.Err` + error handler,
  * /root/reference/rules/base_ruler.go:197-213, errors/base.go:12-80).
  */
object Validate {

  /** Null ⇔ valid; otherwise a reason code.
    *
    * Image presence is tested via the image's key leaf (`after.repo` /
    * `before.repo`) rather than the struct itself: an image without its key
    * is unusable and classifies identically, and the leaf test lets nested
    * schema pruning keep `content` out of the validation scan's ReadSchema
    * (full-struct isNull forces reading every leaf — measured as the
    * difference between a narrow and a full-width stats pass).
    */
  val errorExpr: Column = {
    val op = col("op")
    val hasAfter = col("after.repo").isNotNull
    val hasBefore = col("before.repo").isNotNull
    when(!op.isin(Ops.all.toSeq: _*), lit("unknown_op"))
      .when(op === Ops.Ddl && col("ddl.kind").isNull, lit("ddl_missing_payload"))
      .when(op.isin(Ops.rowOps.toSeq: _*) && (col("repo").isNull || col("path").isNull), lit("null_key"))
      .when(op === Ops.Insert && !hasAfter, lit("insert_missing_after"))
      .when(op === Ops.Update && !(hasBefore && hasAfter), lit("update_arity"))
      .when(op === Ops.Delete && !hasBefore, lit("delete_missing_before"))
      .otherwise(lit(null).cast("string"))
  }

  def valid(events: DataFrame): DataFrame = events.filter(errorExpr.isNull)

  /** Dead-letter rows: original event + reason (reference wraps consumer
    * errors with the full event dump, /root/reference/consumes/factory.go:221-237). */
  def deadLetters(events: DataFrame): DataFrame =
    events.withColumn("_error", errorExpr).filter(col("_error").isNotNull)
}
