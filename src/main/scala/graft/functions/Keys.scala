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
}
