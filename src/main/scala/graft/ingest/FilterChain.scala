package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Conjunctive, default-deny filter chain — the reference's `FilterHandler`
  * (/root/reference/rules/filter_handler.go:8,47-57): ALL predicates must
  * pass; an EMPTY chain rejects everything ("为保证安全，没有过滤函数，默认不过").
  * Catalyst ANDs, reorders, and short-circuits the conjuncts in codegen, so
  * the reference's manual cheapest-first prepending
  * (/root/reference/rules/filter_handler.go:16-20) is free here.
  */
final class FilterChain private (private val preds: Seq[Column]) extends Serializable {
  def add(p: Column): FilterChain = new FilterChain(preds :+ p)

  /** The combined predicate; empty chain ⇒ lit(false) (default-deny). */
  def expr: Column = preds.reduceOption(_ && _).getOrElse(lit(false))

  def isEmpty: Boolean = preds.isEmpty
}

object FilterChain {
  /** Default-deny (the reference's unconfigured chain). */
  def empty: FilterChain = new FilterChain(Nil)

  /** Pass-all — what a configured "fake" rule does
    * (/root/reference/rules/factory.go:34-44). */
  def passAll: FilterChain = new FilterChain(Seq(lit(true)))

  /** Table filter truth table (/root/reference/config/tablefilter.go:13-45):
    * pass iff repo matches (when given) AND (include empty OR repo-path ∈
    * include) AND (exclude empty OR ∉ exclude). Keys here are repos, the
    * engine's "table" analog.
    */
  def tableFilter(include: Seq[String] = Nil, exclude: Seq[String] = Nil): Column = {
    val inc = if (include.isEmpty) lit(true) else col("repo").isin(include: _*)
    val exc = if (exclude.isEmpty) lit(true) else !col("repo").isin(exclude: _*)
    inc && exc
  }

  /** Source-side regex restriction — the canal `include_table_regex` analog
    * (/root/reference/examples/00-fake/00-fake.toml:6); pushable to the scan. */
  def repoRegex(re: String): Column = col("repo").rlike(re)

  /** Sync-type filter (/root/reference/rules/filter_handler.go:23-41):
    * pass iff op ∈ configured list. */
  def opFilter(ops: Seq[String]): Column = col("op").isin(ops: _*)
}
