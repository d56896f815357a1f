package graft.gen

import graft.model._
import scala.collection.mutable

/** In-memory sequential-replay oracle: the ground truth the engine must
  * converge to. Applies events strictly in `seq` order with the apply
  * semantics of the reference's SQL maker
  * (/root/reference/event/sql_maker.go:11-13,80-120):
  *   insert → full after-image upsert; update → after-image upsert keyed by
  *   (repo, path); delete → keyed tombstone; ddl → schema evolution.
  *
  * Upsert-on-missing for update mirrors the engine's MERGE
  * `WHEN NOT MATCHED AND op != 'delete' THEN INSERT` branch — well-defined
  * under replay regardless of history.
  */
object Oracle {
  final case class Entry(row: RepoRow, seq: Long)

  final case class State(
      rows: mutable.HashMap[(String, String), Entry] = mutable.HashMap.empty,
      // evolved schema: ordered (name, type) of EXTRA columns beyond the base 5
      extraColumns: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap.empty) {

    def applyOne(e: ChangeEvent): Unit = e.op match {
      case Ops.Insert | Ops.Update =>
        val after = e.after.get
        rows((e.repo, e.path)) = Entry(after, e.seq)
      case Ops.Delete =>
        rows.remove((e.repo, e.path))
      case Ops.Ddl =>
        val d = e.ddl.get
        d.kind match {
          case "add_column" => extraColumns(d.column) = d.toType
          case "widen_type" => if (extraColumns.contains(d.column)) extraColumns(d.column) = d.toType
          case "rename_column" =>
            extraColumns.remove(d.column).foreach { t =>
              extraColumns(d.newName) = t
            }
          case other => throw new IllegalArgumentException(s"unknown ddl kind: $other")
        }
      case other => throw new IllegalArgumentException(s"unknown op: $other")
    }
  }

  def replay(events: Seq[ChangeEvent]): State = {
    val st = State()
    events.filter(e => Ops.all.contains(e.op)).sortBy(_.seq).foreach(st.applyOne)
    st
  }

  /** Final table as (repo, path) → (content sha256 hex, seq) — the per-row
    * invariant the north rule checks. */
  def contentSha(st: State): Map[(String, String), (String, Long)] =
    st.rows.map { case (k, Entry(row, seq)) => k -> (sha256Hex(row.content), seq) }.toMap

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }
}
