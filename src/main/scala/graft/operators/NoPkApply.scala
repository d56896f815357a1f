package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The reference's no-primary-key fallback, preserved for fidelity
  * (/root/reference/event/sql_maker.go:80-120): when the target table has no
  * PK, an UPDATE's match predicate is the ENTIRE before-image and a DELETE
  * removes every row equal to the before-image; INSERT appends the
  * after-image. Without a key there is no last-writer-wins — semantics are
  * inherently sequential in `seq` order, exactly like the reference's
  * row-at-a-time SQL apply (each event folds set-orientedly: one anti-join
  * or union per event).
  *
  * This is a fidelity/edge path for keyless tables, not the scale path — the
  * engine's primary apply is the keyed MERGE (graft.ingest.MergeApply).
  */
object NoPkApply {

  /** Hard cap on the keyless fold: each event adds a plan layer, so an
    * unbounded batch would melt the analyzer; beyond this, a keyless table is
    * the wrong tool and the caller should assign a synthetic key. */
  val MaxEvents = 10000
  /** Materialize the folded state every K events so plan depth stays bounded
    * (localCheckpoint truncates lineage; without it the plan grows linearly
    * and analysis time quadratically). */
  val CheckpointEvery = 32

  /** @param state  current table rows (any schema)
    * @param events rows with (op, seq, before:struct, after:struct) whose
    *               struct fields match the state schema
    * @return state after folding the events in seq order
    */
  def applyAll(state: DataFrame, events: DataFrame): DataFrame = {
    val cols = state.columns
    val ordered: Array[Row] = events
      .select(col("op"), col("seq"), col("before"), col("after"))
      .collect()
      .sortBy(_.getLong(1))
    require(ordered.length <= MaxEvents,
      s"NoPkApply folds ${ordered.length} events sequentially (cap $MaxEvents): " +
        "keyless apply is inherently row-at-a-time — give the table a key and use MergeApply")
    ordered.zipWithIndex.foldLeft(state) { case (st0, (ev, i)) =>
      val st = if (i > 0 && i % CheckpointEvery == 0) st0.localCheckpoint(true) else st0
      val op = ev.getString(0)
      def image(i: Int): Map[String, Any] = {
        val r = ev.getStruct(i)
        cols.map(c => c -> (if (r == null) null else r.get(r.fieldIndex(c)))).toMap
      }
      def matchesImage(img: Map[String, Any]) =
        cols.map(c => col(c) <=> lit(img(c))).reduce(_ && _)
      op match {
        case "insert" =>
          st.unionByName(rowOf(st, image(3)))
        case "delete" =>
          st.filter(!matchesImage(image(2)))
        case "update" =>
          // matching rows become the after-image (all of them, like SQL UPDATE)
          val img = image(2)
          st.filter(!matchesImage(img)).unionByName(
            st.filter(matchesImage(img)).select(cols.map(c => lit(image(3)(c)).as(c)): _*))
        case _ => st
      }
    }
  }

  private def rowOf(like: DataFrame, img: Map[String, Any]): DataFrame =
    like.limit(0).select(like.columns.map(c => col(c)): _*)
      .unionByName(
        like.sparkSession.range(1).select(like.columns.map(c => lit(img(c)).as(c)): _*))
}
