package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key dedup/coalesce: keep only the highest-`seq` event per (repo, path)
  * within a batch. This collapses (a) exact duplicate deliveries of the same
  * (partition, offset) — the at-least-once replay the reference tolerates
  * only implicitly (SURVEY §2.3 A5, /root/reference/cobra/cobra.go:193-204) —
  * and (b) multiple changes to one key in one batch, of which only the last
  * writer can matter under LWW.
  *
  * Implemented as groupBy + max_by, a DeclarativeAggregate with map-side
  * partial aggregation: a hot key (one file updated millions of times) is
  * reduced per-partition BEFORE the shuffle, so key skew does not serialize
  * (the fix for the reference's one-goroutine-per-hot-key bottleneck,
  * SURVEY §2.6 P5).
  */
object Dedup {

  /** One-pass formulation — the default: map-side partial max_by collapses
    * each task's events to one candidate per locally-seen key BEFORE the
    * shuffle (events of a key cluster in a log partition, so the reduction
    * factor ≈ events-per-key), and the single shuffle moves only candidates.
    *
    * An alternative broadcast formulation (narrow max(seq) winners +
    * broadcast semi-join, [[lastWriterPerKeyBroadcast]]) avoids wide map-side
    * buffers but pays a driver-serial broadcast build proportional to the
    * batch's key count — measured strictly worse at high parallelism. */
  def lastWriterPerKey(events: DataFrame): DataFrame =
    events
      .groupBy(col("repo"), col("path"))
      .agg(graft.functions.LastWriterAgg.lastWriter(
        struct(col("op"), col("seq"), col("after")), col("seq")).as("_w"))
      .select(col("repo"), col("path"),
        col("_w.op").as("op"), col("_w.seq").as("seq"), col("_w.after").as("after"))

  /** Built-in-functions form (max_by) — identical semantics, but Spark plans
    * it as a SortAggregate (struct buffer ⇒ no hash aggregation); kept for
    * comparison benchmarks and as the zero-custom-code fallback. */
  def lastWriterPerKeyMaxBy(events: DataFrame): DataFrame =
    events
      .groupBy(col("repo"), col("path"))
      .agg(max_by(struct(col("op"), col("seq"), col("after")), col("seq")).as("_w"))
      .select(col("repo"), col("path"),
        col("_w.op").as("op"), col("_w.seq").as("seq"), col("_w.after").as("after"))

  /** Broadcast variant: winner seqs via narrow Tungsten max + broadcast
    * semi-join. Useful when map-side buffers must stay minimal AND the
    * per-batch key count is small; the broadcast build is driver-serial. */
  def lastWriterPerKeyBroadcast(events: DataFrame): DataFrame = {
    val winners = events
      .groupBy(col("repo"), col("path"))
      .agg(max(col("seq")).as("seq"))
    events
      .join(broadcast(winners), Seq("repo", "path", "seq"), "left_semi")
      .select(col("repo"), col("path"), col("op"), col("seq"), col("after"))
      .dropDuplicates("repo", "path", "seq") // exact re-deliveries collapse
  }

  /** Explicitly salted two-phase variant: pre-aggregate on (key, salt) to
    * split a pathologically hot key across `salt` reducers, then finish on
    * the key (the north rule's "salted repartitioning breaks hot-repo skew").
    * With max_by's partial aggregation the unsalted form is already
    * skew-safe; this exists for the (rare) case where per-map-task partial
    * state must stay tiny, and as the explicit skew-handling surface.
    */
  def lastWriterPerKeySalted(events: DataFrame, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    events
      .withColumn("_salt", pmod(hash(col("offset")), lit(salt)))
      .groupBy(col("repo"), col("path"), col("_salt"))
      .agg(max_by(struct(col("op"), col("seq"), col("after")), col("seq")).as("_w"))
      .groupBy(col("repo"), col("path"))
      .agg(max_by(col("_w"), col("_w.seq")).as("_w"))
      .select(col("repo"), col("path"),
        col("_w.op").as("op"), col("_w.seq").as("seq"), col("_w.after").as("after"))
  }
}
