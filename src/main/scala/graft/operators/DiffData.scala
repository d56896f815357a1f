package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Changed-fields diff projection — the reference's `DiffData`
  * (/root/reference/config/aggregation.go:164-207): field-wise compare of a
  * before/after row pair, emitting ONLY the changed fields, with
  * `exclude_field`s dropped from the comparison and the `primary_key`
  * re-attached to the output. Null-safe (`<=>`): null→value and value→null
  * both count as changes, null→null does not — matching reflect.DeepEqual
  * semantics on absent keys.
  */
object DiffData {

  /** Names of the fields that differ between two struct columns, as a sorted
    * array (empty array = no-op change, the reference returns nil). */
  def changedFieldNames(
      before: Column, after: Column,
      fields: Seq[String], exclude: Seq[String]): Column = {
    val considered = fields.filterNot(exclude.contains)
    require(considered.nonEmpty, "no fields left to diff")
    val tagged = considered.map { f =>
      when(!(before.getField(f) <=> after.getField(f)), lit(f))
    }
    array_sort(array_compact(array(tagged: _*)))
  }

  /** Changed fields as a map name → new value (values cast to string, the
    * lowest-common-denominator transfer shape the reference uses for its
    * row maps). */
  def changedFieldMap(
      before: Column, after: Column,
      fields: Seq[String], exclude: Seq[String]): Column = {
    val considered = fields.filterNot(exclude.contains)
    require(considered.nonEmpty, "no fields left to diff")
    map_from_entries(array_compact(array(considered.map { f =>
      when(!(before.getField(f) <=> after.getField(f)),
        struct(lit(f).as("key"), after.getField(f).cast("string").as("value")))
    }: _*)))
  }

  /** Set-oriented DiffData over a frame carrying `before`/`after` struct
    * columns: keeps rows with at least one (non-excluded) change, attaches
    * the primary-key columns and the changed-field names + value map.
    * Field list is taken from the after-struct's schema. */
  def diff(
      df: DataFrame, beforeCol: String, afterCol: String,
      primaryKey: Seq[String], exclude: Seq[String] = Nil): DataFrame = {
    val fields = df.schema(afterCol).dataType match {
      case s: StructType => s.fieldNames.toSeq
      case other => throw new IllegalArgumentException(s"$afterCol is not a struct: $other")
    }
    val names = changedFieldNames(col(beforeCol), col(afterCol), fields, exclude)
    val changes = changedFieldMap(col(beforeCol), col(afterCol), fields, exclude)
    val pkCols = primaryKey.map(col)
    df.select(pkCols ++ Seq(names.as("changed_fields"), changes.as("changes")): _*)
      .filter(size(col("changed_fields")) > 0)
  }
}
