package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's aggregation-key grammar
  * (/root/reference/config/aggregation.go:111-143, separator constants
  * /root/reference/config/base.go:14):
  *
  *   key = [aggreFieldValue ","] [prefix ":"] idxFieldValue
  *
  * where `prefix` may be the literal table name (the `TABLENAME` sentinel,
  * /root/reference/config/config.go:24-32). Null aggre/prefix parts collapse
  * (concat_ws skips nulls, matching the reference's conditional appends).
  */
object Keys {
  val AggreSep = ","
  val PrefixSep = ":"

  def aggregationKey(aggreField: Column, prefix: Column, idxField: Column): Column =
    concat_ws(AggreSep,
      aggreField.cast("string"),
      concat_ws(PrefixSep, prefix.cast("string"), idxField.cast("string")))

  def aggregationKey(idxField: Column): Column =
    aggregationKey(lit(null).cast("string"), lit(null).cast("string"), idxField)

  /** The engine's default key, per the north rule: (repo, path). */
  def repoPathKey(repo: Column, path: Column): Column =
    concat_ws(PrefixSep, repo, path)

  /** Driver-side builder mirroring the exact Go control flow, for tests. */
  def buildKey(aggre: Option[String], prefix: Option[String], idx: String): String = {
    val p = prefix.map(_ + PrefixSep).getOrElse("")
    val a = aggre.map(_ + AggreSep).getOrElse("")
    a + p + idx
  }

  /** The TABLENAME prefix sentinel
    * (/root/reference/config/aggregation.go:117-122). */
  val TableNameSentinel = "TABLENAME"

  /** Per-table key-rule config — the reference's `IdxRuleConfig`
    * (/root/reference/config/config.go:24-32) mapped field-for-field.
    * `userField` ("操作人字段" — the acting-user column) is config-only in
    * the reference; here it is a first-class attribution column read from
    * the same image the key reads ([[userFor]]), so lineage/consumers can
    * carry who made the change. */
  final case class IdxRule(
      tables: Seq[String] = Seq.empty,
      idxField: String,
      idxPrefix: Option[String] = None,
      aggreField: Option[String] = None,
      userField: Option[String] = None,
      primaryKey: Seq[String] = Seq.empty,
      excludeField: Seq[String] = Seq.empty)

  /** Aggregation key for an event frame under `rule`. The reference reads
    * the after-image for updates and the only image otherwise
    * (/root/reference/config/aggregation.go:126-135); callers pass that
    * authoritative image struct. */
  def keyFor(rule: IdxRule, tableName: Column, image: Column): Column = {
    val prefix = rule.idxPrefix match {
      case Some(TableNameSentinel) => tableName.cast("string")
      case Some(p) => lit(p)
      case None => lit(null).cast("string")
    }
    val aggre = rule.aggreField
      .map(f => image.getField(f).cast("string"))
      .getOrElse(lit(null).cast("string"))
    aggregationKey(aggre, prefix, image.getField(rule.idxField))
  }

  /** Acting-user attribution column under `rule` (null when unconfigured). */
  def userFor(rule: IdxRule, image: Column): Column =
    rule.userField.map(f => image.getField(f).cast("string"))
      .getOrElse(lit(null).cast("string"))
}
