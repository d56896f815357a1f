package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{TextDedup, VecExprs}

/** Persisted near-duplicate signature store — the INCREMENTAL shape of
  * [[graft.functions.TextDedup.minHashLshPairs]].
  *
  * A training-data pipeline at 100 TB cannot re-shingle the whole corpus to
  * dedup each incoming batch; it maintains a signature table once and joins
  * each NEW batch against only the LSH buckets the batch touches. This store
  * is that table, laid out so the batch-side read cost is O(batch), never
  * O(corpus):
  *
  *  - `sig/sp=N/` — banded signature rows `(doc, band, bucket, sig, seq)`,
  *    hash-partitioned by BUCKET into `shards` directories. An incoming
  *    batch's buckets map to a set of shards; the scan filter on `sp` is a
  *    partition filter, so Spark lists and reads ONLY those directories —
  *    the corpus outside them is never opened (asserted in SigStoreSpec).
  *  - `head/hp=N/` — per-doc head rows `(doc, seq, alive)`,
  *    hash-partitioned by DOC. The head's latest seq decides which sig rows
  *    are live: an UPDATE moves a doc's band buckets between shards, so a
  *    matched sig row is served only when `seq == head.seq` and the doc is
  *    alive — stale signatures can never produce a candidate pair. Head
  *    reads are pruned to the shards of the matched docs.
  *
  * Both trees are APPEND-ONLY (a micro-batch writes one small file set; no
  * read-modify-write), so maintenance rides any ingest path — see
  * [[maintainFromEvents]], called by the CDC ingest when
  * `IngestConfig.sigStoreDir` is set. Retried appends (a crash between the
  * sink commit and the stream checkpoint) at worst duplicate rows with
  * identical content; reads drop exact duplicates, so convergence holds.
  *
  * Semantics contract (proved hash-exact vs the DuckDB full-recompute oracle
  * by the `dedup_incremental` driver query): `incrementalPairs(batch)` over a
  * store holding corpus C equals `minHashLshPairs(C ∪ batch)` restricted to
  * pairs with at least one side in the batch — including the global
  * bucket-size cap, because every bucket the batch touches is read in full
  * (store side + batch side), so its observed size equals its full-corpus
  * size.
  */
object SigStore {

  /** `shards` controls the partition fan-out of both trees — at 100 TB scale
    * raise it so one shard stays executor-sized (it only affects pruning
    * granularity, never results). Signature parameters mirror
    * [[TextDedup.minHashLshPairs]] defaults. */
  final case class Config(
      shingleLen: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      shards: Int = 64,
      bucketCap: Int = TextDedup.DefaultBucketCap) {
    def k: Int = bands * rowsPerBand
  }

  private def sigDir(dir: String) = s"$dir/sig"
  private def headDir(dir: String) = s"$dir/head"

  private val sigSchema = StructType(Seq(
    StructField("doc", StringType), StructField("band", IntegerType),
    StructField("bucket", StringType), StructField("sig", ArrayType(LongType)),
    StructField("seq", LongType), StructField("sp", IntegerType)))
  private val headSchema = StructType(Seq(
    StructField("doc", StringType), StructField("seq", LongType),
    StructField("alive", BooleanType), StructField("hp", IntegerType)))

  private def shardOf(c: Column, shards: Int): Column =
    pmod(xxhash64(c), lit(shards)).cast("int")

  /** Partition count for the pre-write shuffle: pinned (REPARTITION_BY_NUM)
    * so AQE cannot coalesce a small append's shuffle to one task — a single
    * task then opens/commits every touched shard's file SEQUENTIALLY, and the
    * per-file writer overhead (not the data) dominates the append (measured
    * 0.6-0.8 s per write at bench scale). Bounded by the session's shuffle
    * parallelism, so it stays scale-adaptive; file count per append is one
    * per touched shard either way. */
  private def writeParallelism(spark: SparkSession, shards: Int): Int =
    math.max(1, math.min(shards,
      spark.conf.get("spark.sql.shuffle.partitions").toInt))

  /** Banded signature rows of a (doc, text) frame:
    * (doc, band, bucket, sig) — bucket built EXACTLY as in
    * [[TextDedup.minHashLshPairs]] so store-joined pairs agree bit-for-bit
    * with a full recompute (and with the DuckDB oracle). `carry` columns of
    * `docs` ride through narrowly (no join needed to re-attach them). */
  private def banded(docs: DataFrame, doc: Column, text: Column, cfg: Config,
      carry: Seq[(String, Column)] = Nil): DataFrame = {
    val r = cfg.rowsPerBand
    val carried = carry.map { case (n, c) => c.as(n) }
    val carriedOut = carry.map { case (n, _) => col(n) }
    val withSig = docs.select(doc.cast("string").as("doc") +: carried :+
      TextDedup.minHashSignatureFromHashes(
        TextDedup.shingleHashes(text, cfg.shingleLen), cfg.k).as("sig"): _*)
    withSig.select((col("doc") +: carriedOut) ++ Seq(col("sig"),
      explode(transform(sequence(lit(0), lit(cfg.bands - 1)),
        b => struct(b.cast("int").as("band"),
          concat_ws("|", b.cast("string"), concat_ws(",",
            transform(slice(col("sig"), b * r + 1, lit(r)),
              x => x.cast("string")))).as("bucket")))).as("bb")): _*)
      .select((col("doc") +: carriedOut) ++ Seq(
        col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("sig")): _*)
  }

  /** Read ONLY the named shard directories (explicit paths + basePath), so
    * even the file LISTING is O(matched shards): a plain `parquet(root)` read
    * discovers the whole tree before partition pruning — at 10^3..10^5 shard
    * dirs that listing alone dwarfs a small batch's real work. */
  private def readShards(spark: SparkSession, dir: String, pcol: String,
      ids: Seq[Int], schema: StructType): DataFrame = {
    val paths = ids.map(i => s"$dir/$pcol=$i")
      .filter(p => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p)))
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.option("basePath", dir).schema(schema).parquet(paths: _*)
  }

  /** Append signature + head rows for UPSERTED docs. `docs` must carry at
    * most one row per doc (LWW-deduped upstream — the ingest payload already
    * is). One scan, two small writes; no shuffle beyond the partitioned
    * write's fan-out. */
  def appendUpserts(dir: String, docs: DataFrame,
      doc: Column, text: Column, seq: Column, cfg: Config): Unit = {
    val d = docs.select(doc.cast("string").as("doc"), text.as("text"), seq.cast("long").as("seq"))
    // repartition by the shard column first: each touched shard receives
    // exactly ONE file per append (without it, every write task fans out to
    // every shard dir — tasks × shards small files per append, and the
    // store's file count, not its row count, becomes the read bottleneck).
    // seq rides through banded() narrowly — re-attaching it with a join
    // would cost a shuffle on EVERY micro-batch of a store-riding ingest.
    banded(d, col("doc"), col("text"), cfg, carry = Seq("seq" -> col("seq")))
      .withColumn("sp", shardOf(col("bucket"), cfg.shards))
      .repartition(writeParallelism(d.sparkSession, cfg.shards), col("sp"))
      .write.mode("append").partitionBy("sp").parquet(sigDir(dir))
    // head rows carry only (doc, seq, alive): with no text-derived column the
    // head write never touches the content — parquet column pruning makes
    // this second pass metadata-cheap. (An earlier version also stored a
    // simhash sketch here, re-shingling the whole corpus per append for a
    // column no read path ever consumed.)
    appendHeads(dir, d.select(col("doc"), col("seq"), lit(true).as("alive")), cfg)
  }

  /** Append head tombstones for DELETED docs (their sig rows become
    * unreachable — `incrementalPairs` serves only alive head-seq rows). */
  def appendDeletes(dir: String, docs: DataFrame, doc: Column, seq: Column, cfg: Config): Unit =
    appendHeads(dir, docs.select(doc.cast("string").as("doc"),
      seq.cast("long").as("seq"), lit(false).as("alive")), cfg)

  /** Append head rows (doc, seq, alive) with NO signature rows. Advancing the
    * head without signatures makes the doc's previous sig rows unreachable
    * (reads serve only `seq == head_seq`) — used for deletes (alive=false)
    * and for winners whose carried image NULLS the content (alive=true):
    * the table overwrites content to null in that case (MergeApply's
    * image-overwrite semantics — only columns ABSENT from the image are
    * preserved), so the store must stop serving the stale signature too. */
  private def appendHeads(dir: String, rows: DataFrame, cfg: Config): Unit =
    rows.select(col("doc"), col("seq"), col("alive"))
      .withColumn("hp", shardOf(col("doc"), cfg.shards))
      .repartition(writeParallelism(rows.sparkSession, cfg.shards), col("hp"))
      .write.mode("append").partitionBy("hp").parquet(headDir(dir))

  /** Maintain the store from one CDC micro-batch of RAW change events
    * (`repo`,`path`,`op`,`seq`,`after`): the batch is LWW-deduped here
    * (one winner per key, mirroring the table's per-batch semantics — an
    * intermediate in-batch version never lands in the table, so it must not
    * land in the store either). Winners that CARRY content re-sign the doc;
    * winners with a NULL content null the table row's content (MergeApply
    * image-overwrite semantics), so they advance the head seq WITHOUT new
    * sig rows — the old signature becomes unreachable, matching the table;
    * deletes tombstone the head. Doc key = `repo/path`. Append-only +
    * head-seq resolution make this idempotent and re-delivery-tolerant: the
    * head advances with EVERY winner (content-carrying or not), so a
    * replayed old event always appends rows below the head seq, which reads
    * never serve. */
  def maintainFromEvents(dir: String, events: DataFrame, cfg: Config): Unit = {
    val lww = events
      .groupBy(col("repo"), col("path"))
      .agg(max_by(struct(col("op"), col("seq"), col("after")), col("seq")).as("_w"))
      .select(col("repo"), col("path"),
        col("_w.op").as("op"), col("_w.seq").as("seq"), col("_w.after").as("after"))
      .persist() // three write actions below share the one dedup shuffle
    try {
      val key = concat_ws("/", col("repo"), col("path"))
      val ups = lww.filter(col("op") =!= graft.model.Ops.Delete &&
        col("after.content").isNotNull)
      appendUpserts(dir, ups, key, col("after.content"), col("seq"), cfg)
      // deletes and content-nulling winners share ONE head-only append
      appendHeads(dir, lww.filter(col("op") === graft.model.Ops.Delete ||
          col("after.content").isNull)
        .select(key.as("doc"), col("seq").cast("long").as("seq"),
          (col("op") =!= graft.model.Ops.Delete).as("alive")), cfg)
    } finally lww.unpersist(blocking = false)
  }

  /** The sig shards a batch's LSH buckets hash into — exactly the store
    * directories [[incrementalPairs]] will read (exposed for tests and for
    * capacity planning: |shards touched| / shards bounds the read fraction). */
  def batchShards(batch: DataFrame, doc: Column, text: Column, cfg: Config): Set[Int] =
    banded(batch, doc, text, cfg)
      .select(shardOf(col("bucket"), cfg.shards).as("sp")).distinct()
      .collect().map(_.getInt(0)).toSet

  /** Candidate near-dup pairs of `batch` against the store (and within the
    * batch), WITHOUT scanning the corpus: cost is O(batch × matched shards).
    * Batch docs replace their own store rows (update semantics). Returns
    * (id_a, id_b, est_jaccard) with id_a < id_b (as strings), est ≥ minEst,
    * at least one side in the batch; materialized (safe to delete nothing —
    * the caller may drop temp stores after this returns). */
  def incrementalPairs(spark: SparkSession, dir: String, batch: DataFrame,
      doc: Column, text: Column, cfg: Config, minEst: Double): DataFrame =
    incrementalPairsImpl(spark, dir, batch, doc, text, cfg, minEst, materialize = true)

  /** [[incrementalPairs]] without the final materialization — plan-inspection
    * hook (the live plan references the store, so the caller must keep `dir`
    * until the result is consumed). */
  private[graft] def incrementalPairsPlan(spark: SparkSession, dir: String, batch: DataFrame,
      doc: Column, text: Column, cfg: Config, minEst: Double): DataFrame =
    incrementalPairsImpl(spark, dir, batch, doc, text, cfg, minEst, materialize = false)

  private def incrementalPairsImpl(spark: SparkSession, dir: String, batch: DataFrame,
      doc: Column, text: Column, cfg: Config, minEst: Double,
      materialize: Boolean): DataFrame = {
    val k = cfg.k
    val nb = banded(batch, doc, text, cfg).persist()
    try {
      // the batch's buckets — small by contract (≤ |batch| × bands values);
      // ONE driver collect yields both the shard list (directory pruning)
      // and the bucket set (the semi-join side)
      val bs = nb.select(col("bucket"), shardOf(col("bucket"), cfg.shards).as("sp"))
        .distinct().collect()
      val sps = bs.map(_.getInt(1)).distinct.toSeq
      import spark.implicits._
      val bucketsDF = bs.map(_.getString(0)).distinct.toSeq.toDF("bucket")
      // shard-pruned store scan: ONLY the matched shard directories are even
      // LISTED (explicit paths), let alone read (asserted via inputFiles in
      // the spec) — the corpus outside them never costs a stat call.
      val matched0 = readShards(spark, sigDir(dir), "sp", sps, sigSchema)
        .join(broadcast(bucketsDF), Seq("bucket"), "left_semi")
      // staleness resolution: serve a sig row only at the doc's head seq and
      // only while alive (updates move buckets between shards; the head is
      // the single source of truth). Head read pruned to matched-doc shards —
      // discovered with a dedicated job over `matched` (persisted: it then
      // feeds the final plan too) UNLESS the batch's buckets already hash
      // into EVERY shard, where pruning is a no-op: reading all head shard
      // dirs directly skips both the discovery job and the persist.
      val pruneHeads = sps.size < cfg.shards
      val matched = if (pruneHeads) matched0.persist() else matched0
      val hps =
        if (!pruneHeads) (0 until cfg.shards).toSeq
        else matched.select(shardOf(col("doc"), cfg.shards).as("hp")).distinct()
          .collect().map(_.getInt(0)).toSeq
      val head = readShards(spark, headDir(dir), "hp", hps, headSchema)
        .groupBy(col("doc"))
        .agg(max_by(struct(col("seq"), col("alive")), col("seq")).as("h"))
        .select(col("doc"), col("h.seq").as("head_seq"), col("h.alive").as("head_alive"))
      val live = matched.join(head, Seq("doc"))
        .filter(col("head_alive") && col("seq") === col("head_seq"))
        // exact-duplicate retry copies (append-only store) collapse here;
        // rows per (doc, band) are identical at the head seq by construction
        .dropDuplicates(Seq("doc", "band"))
      // batch docs REPLACE their store rows; union carries a side tag
      val storeSide = live
        .join(broadcast(nb.select(col("doc")).distinct()), Seq("doc"), "left_anti")
        .select(col("doc"), col("band"), col("bucket"), col("sig"))
      val u = storeSide.withColumn("is_new", lit(false))
        .unionByName(nb.select(col("doc"), col("band"), col("bucket"), col("sig"))
          .withColumn("is_new", lit(true)))
        .persist()
      try {
        // global cap, observed locally: every batch-touched bucket is read in
        // full, so its size here equals its full-corpus size (mirrors
        // TextDedup.dropOversizedBuckets — broadcast anti-join, no window)
        val oversized = u.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .filter(col("n") > cfg.bucketCap).select(col("bucket"))
        val capped = u.join(broadcast(oversized), Seq("bucket"), "left_anti")
        val a = capped.alias("a"); val b = capped.alias("b")
        val est = VecExprs.eqCount(col("a.sig"), col("b.sig")).cast("double") / lit(k)
        val pairs = a.join(b, col("a.bucket") === col("b.bucket") &&
            col("a.doc") < col("b.doc") && (col("a.is_new") || col("b.is_new")))
          .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"), est.as("est_jaccard"))
          .distinct()
          .filter(col("est_jaccard") >= minEst)
        if (materialize) pairs.localCheckpoint(true) else pairs
      } finally {
        u.unpersist(blocking = false)
        if (pruneHeads) matched.unpersist(blocking = false)
      }
    } finally nb.unpersist(blocking = false)
  }
}
