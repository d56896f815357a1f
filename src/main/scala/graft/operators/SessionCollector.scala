package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's ONLY windowing operator, re-expressed Spark-first: the
  * `Collector` (/root/reference/config/collector.go:14-124) buffers events
  * per key and re-arms a timer on EVERY append (`AppendEvent`, lines 76-98),
  * flushing the group `gap` after the LAST event — i.e. a session window
  * with gap = `aggregation.time` seconds.
  *
  * Two forms:
  *  - [[sessionize]]: declarative `session_window` groupBy — the idiomatic
  *    (and batch-compatible) form; Catalyst plans the gap-merge natively.
  *  - [[collectGroupsStreaming]]: `flatMapGroupsWithState` with a
  *    processing-time timeout re-armed per event — the EXACT runtime shape of
  *    the reference's timer (including emitting the full event group, which
  *    is what its consumers receive: `[]event.Event`,
  *    /root/reference/consumes/factory.go:137-143). State is bounded by the
  *    state store (RocksDB/HDFS-backed), fixing the reference's unbounded
  *    in-heap map (SURVEY §4.3.4).
  */
object SessionCollector {

  /** Declarative session aggregation over any keyed event frame.
    * Works in batch AND streaming (append mode with watermark).
    *
    * @param events frame with the key column, a timestamp column, and payload
    * @param key    grouping key column name
    * @param ts     event-time timestamp column name
    * @param gap    session gap, e.g. "30 seconds"
    */
  def sessionize(events: DataFrame, key: String, ts: String, gap: String): DataFrame =
    events
      .groupBy(col(key), session_window(col(ts), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(ts)).as("first_ts"),
        max(col(ts)).as("last_ts"))
      .select(col(key),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("first_ts"), col("last_ts"))

  /** One emitted group: the key and its buffered event payloads, flushed
    * `gapMillis` of processing time after the last append — byte-for-byte the
    * reference Collector contract (flush emits the key on SendChan, MoveEvents
    * drains the buffer, /root/reference/config/collector.go:81-124). */
  final case class SessionGroup(key: String, events: Seq[String], flushedAtLastCount: Int)

  /** Exact-semantics streaming collector. Input: Dataset of (key, payload).
    * Output: flushed groups. STREAMING ONLY: in batch execution
    * ProcessingTimeTimeout never fires, so every group buffers and the result
    * is empty — use [[sessionize]] for batch session aggregation.
    */
  def collectGroupsStreaming(
      events: Dataset[(String, String)],
      gapMillis: Long): Dataset[SessionGroup] = {
    implicit val bufEnc: Encoder[Seq[String]] = Encoders.kryo[Seq[String]]
    implicit val outEnc: Encoder[SessionGroup] = Encoders.product[SessionGroup]
    events
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[Seq[String], SessionGroup](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[Seq[String]]) =>
          if (state.hasTimedOut) {
            // the re-armed timer fired `gap` after the last append: flush
            val buf = state.getOption.getOrElse(Seq.empty)
            state.remove()
            Iterator.single(SessionGroup(key, buf, buf.size))
          } else {
            // append, and RE-ARM the timer (collector.go:76-98 stops and
            // resets the *time.Timer on every AppendEvent)
            val buf = state.getOption.getOrElse(Seq.empty) ++ rows.map(_._2)
            state.update(buf)
            state.setTimeoutDuration(gapMillis)
            Iterator.empty
          }
      }
  }
}
