package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract: one entry per operator from SURVEY §2, expressed over the
  * driver's parquet testdata, each with a DuckDB-equivalent oracle SQL.
  *
  * The `events` table (event_id, ts, user_id, event_type, value, props) plays
  * the changelog: event_id ≈ log offset/seq, user_id ≈ key, event_type ≈
  * action. A fixed event_type→op mapping mirrors the reference's action model
  * (/root/reference/event/event.go:18-24): signup→insert, click/purchase→
  * update, error→delete, view→unknown (dead-letter fodder for the validation
  * operator, /root/reference/event/event.go:171-212).
  *
  * The engine's REAL data path (LakeTable MERGE, offset fence, schema
  * evolution, streaming) is exercised by the sbt test suites; these queries
  * are the SQL-checkable projections of each operator's semantics.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** event_type → CDC op (shared with every oracle below). */
  private val opCol: Column =
    when(col("event_type") === "signup", "insert")
      .when(col("event_type").isin("click", "purchase"), "update")
      .when(col("event_type") === "error", "delete")
      .otherwise("unknown")

  private val opSql =
    """CASE WHEN event_type = 'signup' THEN 'insert'
      |     WHEN event_type IN ('click','purchase') THEN 'update'
      |     WHEN event_type = 'error' THEN 'delete'
      |     ELSE 'unknown' END""".stripMargin.replace('\n', ' ')

  /** integer cents: double-safe aggregation output for hash comparison */
  private def cents(c: Column): Column = round(sum(c) * 100).cast("long")

  // ---------------------------------------------------------------- flagship

  /** Flagship: last-writer-wins dedup fold on sf0.001 (driver smoke-check). */
  def entry(spark: SparkSession): DataFrame =
    qDedupLww(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------- CDC operator set

  /** F5/F6 — validate + project: unknown actions are dead-lettered, survivors
    * are projected to the normalized event shape. */
  private def qValidateProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("op", opCol)
      .filter(col("op").isin("insert", "update", "delete"))
      .select(col("event_id"), col("user_id"), col("op"))

  /** F1/F3/F4 — conjunctive filter chain (op filter ∧ key exclude-list ∧ user
    * row predicate), short-circuited by Catalyst. */
  private def qFilterChain(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("op", opCol)
      .filter(col("op").isin("insert", "update") &&
        !(col("user_id") % 10).isin(3, 7) &&
        col("value") > 5.0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** F2 — table include/exclude truth table
    * (/root/reference/config/tablefilter.go:13-45). */
  private def qTableFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type").isin("click", "view", "purchase") &&
        !col("event_type").isin("view"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** A5 — dedup by (key, offset): last writer per key. The engine's own
    * hash-aggregating LWW kernel ([[graft.functions.LastWriterAgg]]) instead
    * of a row_number window: partial (map-side) aggregation keeps per-task
    * state at one row per key, where the window sorted every event of a key
    * inside one task. event_id is unique, so "row_number=1 by event_id desc"
    * and "max event_id" pick the identical row. */
  private def qDedupLww(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(graft.functions.LastWriterAgg.lastWriter(
        struct(col("event_id"), col("event_type"), col("value")), col("event_id")).as("_w"))
      .select(col("user_id"), col("_w.event_id").as("last_event_id"),
        col("_w.event_type").as("last_event_type"), col("_w.value").as("last_value"))

  /** S5/§2.4 — merge-apply fold: the final table state after replaying the
    * log (last writer per key, deletes drop the row). Same LWW-aggregate
    * shape as [[qDedupLww]]; the delete filter applies to the WINNER, after
    * the fold, exactly as the window formulation filtered rn=1 rows. */
  private def qMergeFold(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("op", opCol)
      .groupBy(col("user_id"))
      .agg(graft.functions.LastWriterAgg.lastWriter(
        struct(col("event_id"), col("op"), col("value")), col("event_id")).as("_w"))
      .filter(col("_w.op") =!= "delete")
      .select(col("user_id"), col("_w.event_id").as("last_event_id"),
        col("_w.op").as("op"), col("_w.value").as("last_value"))

  /** A2 — session-gap aggregation (the reference's only window: a
    * processing-time session with re-armed timer,
    * /root/reference/config/collector.go:76-98), gap = 30 min. */
  private def qSessionAgg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("_new",
        when(lag(col("_us"), 1).over(w).isNull ||
          col("_us") - lag(col("_us"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("_us")).as("session_start_us"),
        count(lit(1)).as("n_events"),
        cents(col("value")).as("value_cents"))
  }

  /** A1 — aggregation-key grammar `[aggreField ","][prefix ":"]idxField`
    * (/root/reference/config/aggregation.go:111-143). */
  private def qKeyBuilder(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("key",
        concat(col("event_type"), lit(","), lit("u"), lit(":"), col("user_id").cast("string")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), cents(col("value")).as("value_cents"))

  /** A4 — row diff / change detection (skip no-op updates,
    * /root/reference/config/aggregation.go:164-207). */
  private def qDiffChanged(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    t(s, dir, "events")
      .withColumn("_prev", lag(col("value"), 1).over(w))
      .withColumn("_chg",
        when(col("_prev").isNotNull && col("value") =!= col("_prev"), 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("_chg")).as("n_changed"), count(lit(1)).as("n_events"))
  }

  /** S3/E4 — per-partition offset fence / position report
    * (/root/reference/cobra/cobra.go:144-169). */
  private def qFenceReport(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("log_partition", col("user_id") % 8)
      .groupBy(col("log_partition"))
      .agg(max(col("event_id")).as("fence_offset"), count(lit(1)).as("n_events"))

  /** The events table recast as the engine's changelog (ChangeEvent rows):
    * key = (repo = 'r'||user_id%8, path = user_id), seq/offset = event_id,
    * partition = user_id%4, image = (commit = event_id, lang = event_type,
    * content = cents of value). Fuel for the queries that drive the REAL
    * lake path (two-phase replay → time travel / change feed); every field
    * is re-derivable in DuckDB, so the oracles check the actual LakeTable
    * machinery, not a semantic projection. */
  private def eventsAsChangelog(s: SparkSession, dir: String): (DataFrame, Long) = {
    import graft.model.Schemas
    val ev = t(s, dir, "events").withColumn("op", opCol)
      .filter(col("op").isin("insert", "update", "delete"))
    val repo = concat(lit("r"), (col("user_id") % 8).cast("string"))
    val img = struct(
      repo.as("repo"),
      col("user_id").cast("string").as("path"),
      col("event_id").cast("string").as("commit"),
      col("event_type").as("lang"),
      round(col("value") * 100).cast("long").cast("string").as("content"))
    val log = ev.select(
      (col("user_id") % 4).cast("int").as("partition"),
      col("event_id").cast("long").as("offset"),
      col("event_id").cast("long").as("seq"),
      col("ts").cast("timestamp").as("ts"),
      col("op"),
      repo.as("repo"),
      col("user_id").cast("string").as("path"),
      when(col("op").isin("update", "delete"), img).as("before"),
      when(col("op") =!= "delete", img).as("after"),
      lit(null).cast(Schemas.ddlOp).as("ddl"))
    val split = ev.agg(max(col("event_id")).cast("long")).head.getLong(0) / 2
    (log, split)
  }

  /** Two-phase replay of [[eventsAsChangelog]] into a scratch LakeTable:
    * events ≤ split → v1, the rest → v2. Caller owns deleting `scratch`.
    * Shared with Bench.lakeSplits so the published build/read split measures
    * exactly the hash-verified queries' fixture. */
  private[graft] def twoPhaseTable(s: SparkSession, dir: String)
      : (graft.lake.LakeTable, Long, Long, String) = {
    import graft.ingest.Ingest
    import graft.lake.LakeTable
    val scratch = scratchDir("graft-lake")
    val (log, split) = eventsAsChangelog(s, dir)
    val table = LakeTable.create(s, s"$scratch/table", numBuckets = 16)
    Ingest.replayLog(table, log.filter(col("seq") <= split))
    val v1 = table.snapshot.version
    Ingest.replayLog(table, log.filter(col("seq") > split))
    (table, v1, table.snapshot.version, scratch)
  }

  /** The two-phase fixture is deterministic per sfDir, so the queries that
    * share it (cdc_time_travel, cdc_change_feed) build it once per JVM; the
    * scratch table is removed at exit. Reads only touch the immutable
    * snapshots v1/v2, so sharing one handle is safe. */
  private val twoPhaseCache =
    new java.util.concurrent.ConcurrentHashMap[String, (graft.lake.LakeTable, Long, Long, String)]()

  private[graft] def twoPhaseTableCached(s: SparkSession, dir: String)
      : (graft.lake.LakeTable, Long, Long) = {
    val (t, v1, v2, _) = twoPhaseCache.compute(dir, (_, cached) => {
      // a cached handle is bound to the session that built it — rebuild if
      // that session has been stopped since (same JVM, fresh SparkSession)
      if (cached != null && !cached._1.spark.sparkContext.isStopped) cached
      else {
        val r = twoPhaseTable(s, dir)
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r._4))))
        r
      }
    })
    (t, v1, v2)
  }

  /** Runs `f` over the (cached) two-phase table; the result needs no
    * materialization — the fixture lives until JVM exit. */
  private def withTwoPhaseTable(s: SparkSession, dir: String)(
      f: (graft.lake.LakeTable, Long, Long) => DataFrame): DataFrame = {
    val (table, v1, v2) = twoPhaseTableCached(s, dir)
    f(table, v1, v2)
  }

  /** §2.4/lake — TIME TRAVEL: the committed state as of version v1 (after
    * later commits landed), via `snapshotAt` + snapshot-isolated read. */
  private def qTimeTravel(s: SparkSession, dir: String): DataFrame =
    withTwoPhaseTable(s, dir) { (table, v1, _) =>
      table.read(table.snapshotAt(v1)).select(
        col("path").cast("long").as("user_id"),
        col("commit").cast("long").as("last_event_id"),
        col("lang").as("last_event_type"),
        col("content").cast("long").as("cents"))
    }

  /** §2.4/lake — CHANGE DATA FEED: net row-level changes between v1 and v2
    * served from the TABLE's retained snapshots (ChangeFeed.changesBetween),
    * classified insert/update/delete; deletes carry the pre-image. */
  private def qChangeFeed(s: SparkSession, dir: String): DataFrame =
    withTwoPhaseTable(s, dir) { (table, v1, v2) =>
      graft.lake.ChangeFeed.changesBetween(table, v1, v2).select(
        col("path").cast("long").as("user_id"),
        col("change_op"),
        col("_seq").as("seq"),
        col("commit").cast("long").as("carried_event_id"),
        col("lang").as("carried_event_type"),
        col("content").cast("long").as("carried_cents"))
    }

  /** A6/E3 — lineage metrics: events by op class. */
  private def qOpMetrics(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("op", opCol)
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        cents(col("value")).as("value_cents"))

  /** Enrichment lookup: the reference's rules read reference data from the
    * upstream DB per event (BasicRuler.DBExecute,
    * /root/reference/rules/base_ruler.go:152-170); set-orientedly that is a
    * BROADCAST join of a small dimension onto the event stream — zero
    * shuffle of the big side. */
  private def qEnrichBroadcast(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").withColumn("nkey", col("user_id") % 25)
    val dim = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    ev.join(broadcast(dim), ev("nkey") === dim("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), cents(col("value")).as("value_cents"))
  }

  /** Hot-key detection (skew instrumentation, SURVEY §2.6 P5): the keys whose
    * event counts dominate — what the salting path keys off. Top-10 via
    * orderBy().limit() = TakeOrderedAndProject (a global-window row_number
    * would funnel every distinct key into ONE partition); rank is then
    * derived on the 10 survivors with a tiny self-join (count of strictly
    * better rows + 1 — exact row_number semantics since user_id breaks ties
    * totally). */
  private def qHotKeys(s: SparkSession, dir: String): DataFrame = {
    val top = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(10)
    val a = top.alias("a"); val b = top.alias("b")
    a.join(b,
        col("b.n") > col("a.n") ||
          (col("b.n") === col("a.n") && col("b.user_id") < col("a.user_id")),
        "left")
      .groupBy(col("a.user_id").as("user_id"), col("a.n").as("n"))
      .agg((count(col("b.user_id")) + 1).cast("long").as("rank"))
  }

  /** A4 — changed-fields diff projection (DiffData,
    * /root/reference/config/aggregation.go:164-207): consecutive events per
    * user form (before, after) image pairs; emit the changed field names,
    * with `props` excluded (exclude_field) and the (user_id, event_id) key
    * re-attached (primary_key). */
  private def qChangedFields(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val paired = t(s, dir, "events")
      .withColumn("_prev_id", lag(col("event_id"), 1).over(w))
      .withColumn("before", struct(
        lag(col("event_type"), 1).over(w).as("event_type"),
        lag(col("value"), 1).over(w).as("value"),
        lag(col("props"), 1).over(w).as("props")))
      .withColumn("after", struct(col("event_type"), col("value"), col("props")))
      .filter(col("_prev_id").isNotNull)
    graft.operators.DiffData
      .diff(paired, "before", "after", Seq("user_id", "event_id"), exclude = Seq("props"))
      .select(col("user_id"), col("event_id"),
        concat_ws(",", col("changed_fields")).as("changed"))
  }

  // ---------------------------------------- training-data pipeline operators

  /** Exact dedup: hash-groupBy on full content. */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))

  /** Document fingerprinting. */
  private def qDocFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp"), col("n_chars"))

  /** Quality scoring: pure length/punctuation arithmetic (identical semantics
    * in DuckDB, so hash-comparable). */
  private def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    val nChar = length(txt)
    val nSpace = nChar - length(regexp_replace(txt, " ", ""))
    t(s, dir, "documents").select(
      col("doc_id"),
      nChar.cast("long").as("n_char"),
      (nSpace + 1).cast("long").as("ws_tokens"),
      (nChar - length(regexp_replace(txt, "\\.", ""))).cast("long").as("n_period"),
      (nChar - length(regexp_replace(txt, ",", ""))).cast("long").as("n_comma"))
  }

  /** Language ID via stopword-window counts (n-gram heuristic); all probe
    * tokens are length-5 so raw counts are comparable. */
  private def qTextLangid(s: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    def cnt(tok: String): Column = length(txt) - length(regexp_replace(txt, tok, ""))
    val en = cnt(" the "); val de = cnt(" und "); val fr = cnt(" les "); val es = cnt(" los ")
    t(s, dir, "documents").select(
      col("doc_id"),
      en.cast("long").as("cnt_en"), de.cast("long").as("cnt_de"),
      fr.cast("long").as("cnt_fr"), es.cast("long").as("cnt_es"),
      when(greatest(en, de, fr, es) === 0, "other")
        .when(en >= greatest(de, fr, es), "en")
        .when(de >= greatest(fr, es), "de")
        .when(fr >= es, "fr")
        .otherwise("es").as("predicted"))
  }

  /** Token counting: whitespace tokens + a length-based BPE-ish estimate. */
  private def qTokenCount(s: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    val nChar = length(txt)
    t(s, dir, "documents").select(
      col("doc_id"),
      (nChar - length(regexp_replace(txt, " ", "")) + 1).cast("long").as("ws_tokens"),
      ceil(nChar / lit(4.0)).cast("long").as("bpe_est"))
  }

  /** Embedding L2 norms (ANN building block): in-order fold over the vector
    * with `aggregate` (codegen'd higher-order function, no UDF). */
  /** L2 norm, codegen'd `aggregate` fold — on a 1e-6 FIXED-POINT grid: each
    * x² is rounded to an integer once (per-element double ops are exact IEEE
    * in any engine) and summed as LONGs, so the fold is order-independent.
    * A plain double sum is NOT — Spark folds left-to-right while DuckDB's
    * vectorized SUM accumulates in a different order, and at sf1 one vector
    * landed a last-ulp difference exactly on a round() tie (5512.5). */
  private def qEmbedNorm(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      round(sqrt(graft.functions.VecExprs.fixedDotE6(col("embedding"), col("embedding"))
          .cast("double") / 1e6) * 10000)
        .cast("long").as("norm_e4"))

  /** Brute-force cosine top-k over the embedding column (ANN baseline):
    * 8 query vectors broadcast against all, top-3 by rounded cosine.
    * NOTE: ranks by the ROUNDED cosine (ties broken by id) so the ordering is
    * bit-identical to the DuckDB oracle; norms are projected once per side
    * before the join (a per-pair l2norm re-fold was the round-1 hot spot). */
  private def qAnnCosineTopk(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AnnSearch
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), AnnSearch.l2norm(col("embedding")).as("cnorm"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cnorm").as("qnorm"))
    val pairs = broadcast(q).crossJoin(e)
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(AnnSearch.cosineWithNorms(col("qe"), col("embedding"),
          col("qnorm"), col("cnorm")) * 10000).cast("long").as("cos_e4"))
    // bounded top-k aggregate instead of a row_number window: identical
    // (cos_e4 DESC, vec_id ASC) tie order, but each task keeps only k
    // candidates per query (map-side partial agg) instead of funnelling the
    // whole corpus's pairs through a per-query sort ([[graft.functions.TopKAgg]])
    pairs.groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topK(col("cos_e4"), col("vec_id"), 3).as("_tk"))
      .select(col("qid"), posexplode(col("_tk")))
      .select(col("qid"), col("col.id").as("vec_id"),
        col("col.score").as("cos_e4"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** MinHash+LSH near-dup candidate pairs (shingle→minhash→band→bucket-join).
    * Signatures are md5+affine ([[graft.functions.OracleHash]]), so the
    * DuckDB oracle reproduces them bit-for-bit — full hash-checked. */
  private def qDedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextDedup
      .minHashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleLen = 3, bands = 4, rowsPerBand = 4, minEst = 0.25)
      .select(col("id_a"), col("id_b"),
        round(col("est_jaccard") * 10000).cast("long").as("est_e4"))

  /** INCREMENTAL near-dup: the batch-vs-store shape of dedup_minhash_lsh
    * ([[graft.operators.SigStore]]). The corpus (doc_id % 10 != 0) is loaded
    * into a persisted signature store once; the "incoming batch"
    * (doc_id % 10 == 0) is then near-dup-checked against it WITHOUT scanning
    * the corpus — the store read is partition-pruned to the LSH shards the
    * batch's buckets hash into. Must equal the full-corpus recompute
    * restricted to pairs with a batch side (the DuckDB oracle) bit-for-bit.
    * Orientation is normalized numerically (the store keys docs as strings;
    * string '<' disagrees with numeric '<' on multi-digit ids). */
  /** Scratch dir for the per-invocation temp stores the store-backed queries
    * build (SigStore / IvfIndex): tmpfs when available — the store build is a
    * one-time cost the query pays only for self-containment, and routing it
    * through the sandbox's single shared disk adds write-back stalls that say
    * nothing about the operator (same rationale as Bench's tmpfs work dir). */
  private[graft] def scratchDir(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    (if (java.nio.file.Files.isDirectory(shm))
       java.nio.file.Files.createTempDirectory(shm, prefix)
     else java.nio.file.Files.createTempDirectory(prefix)).toString
  }

  /** Signature-store parameters for `dedup_incremental` — shared with
    * Bench.storeSplits so the published build/probe split measures exactly
    * the hash-verified query's configuration. */
  private[graft] val SigStoreCfg = {
    import graft.operators.SigStore
    SigStore.Config(shingleLen = 3, bands = 4, rowsPerBand = 4)
  }

  private def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SigStore
    val docs = t(s, dir, "documents")
    val cfg = SigStoreCfg
    val store = scratchDir("graft-sigstore")
    try {
      SigStore.appendUpserts(store, docs.filter(col("doc_id") % 10 =!= 0),
        col("doc_id"), col("text"), lit(1L), cfg)
      val pairs = SigStore.incrementalPairs(s, store,
        docs.filter(col("doc_id") % 10 === 0), col("doc_id"), col("text"),
        cfg, minEst = 0.25) // materialized (localCheckpoint) before returning
      pairs.select(
        least(col("id_a").cast("long"), col("id_b").cast("long")).as("id_a"),
        greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("id_b"),
        round(col("est_jaccard") * 10000).cast("long").as("est_e4"))
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(store))
  }

  /** SimHash near-dup pairs (62-bit md5-derived sketch, pigeonhole-blocked at
    * maxHamming=6 — 8-bit blocks; the round-1 default of 12 made 4-5-bit
    * blocks and a near-cartesian candidate set). Hash-checked vs DuckDB. */
  private def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextDedup
      .simHashPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleLen = 3, maxHamming = 6)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))

  /** Exact 1-gram Jaccard between consecutive docs — the SQL-checkable slice
    * of the n-gram-Jaccard dedup operator. */
  private def qTextJaccardAdjacent(s: SparkSession, dir: String): DataFrame = {
    val w = t(s, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), "\\s+"))).as("w"))
    // |distinct words| per doc straight off the array — the explode+groupBy
    // formulation re-split every text a third and fourth time and paid an
    // aggregation exchange per side for a number that is just size(array)
    val sz = t(s, dir, "documents")
      .select(col("doc_id"), size(array_distinct(split(col("text"), "\\s+"))).cast("long").as("sz"))
    val a = w.alias("a"); val b = w.alias("b")
    val inter = a.join(b, col("b.w") === col("a.w") &&
        col("b.doc_id") === col("a.doc_id") + 1)
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sz.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("inter") * lit(10000.0) / (col("sz_a") + col("sz_b") - col("inter")))
          .cast("long").as("jaccard_e4"))
  }

  /** LSH-bucketed ANN (fixed-integer hyperplanes, multi-probe) — the 100 TB
    * scale path; recall vs brute force asserted in TextDedupSpec. The baked
    * plane table makes the bucketing reproducible in DuckDB, so this is
    * hash-checked end-to-end; ranking uses the ROUNDED cosine (ties by id)
    * for bit-identical ordering, like ann_cosine_topk. */
  private def qAnnLshTopk(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AnnSearch
    val bits = 8
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"),
      AnnSearch.l2norm(col("embedding")).as("nrm"),
      AnnSearch.hyperplaneSketch(col("embedding"), bits, AnnSearch.OracleDim).as("bucket"))
    val probes = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"),
        explode(array(col("bucket") +: (0 until bits).map(b =>
          col("bucket").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
    val cand = probes.join(e, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(AnnSearch.cosineWithNorms(col("qe"), col("embedding"),
          col("qn"), col("nrm")) * 10000).cast("long").as("cos_e4"))
      .distinct() // multi-probe: a candidate met via several probed buckets
    // bounded top-k aggregate in place of the row_number window (same
    // rationale and tie order as ann_cosine_topk above)
    cand.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos_e4"), col("neighbor_id"), 3).as("_tk"))
      .select(col("query_id"), posexplode(col("_tk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("cos_e4"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** IVF ANN with a TRAINED coarse quantizer: C=16 centroids, seeded from
    * the first C corpus vectors and refined by 2 deterministic Lloyd
    * iterations ([[graft.functions.AnnSearch.lloydCentroids]] — fixed-point
    * integer means, so DuckDB re-trains to the bit-identical centroids);
    * corpus vectors are assigned to their nearest centroid, queries probe
    * their top-2 centroid lists only, exact cosine re-ranks within the
    * probed lists. At 100 TB the corpus shuffles once by centroid id and
    * each query reads ~nProbe/C of the data; C scales as a parameter
    * (√N at real scale). Assignment/probing order by round(cos*1e9)
    * (ties by centroid id) so the oracle ordering is engine-exact. */
  private def qAnnIvfTopk(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IvfIndex
    // train-once / probe-many: the index (centroids + directory-partitioned
    // inverted lists) is PERSISTED and the query path reads only it —
    // probing prunes list directories, so a query costs ~nProbe/C of the
    // corpus. Ingest appends ride IvfIndex.appendVectors (frozen centroids,
    // same assignment kernel) — proved equal to a rebuild in IvfIndexSpec.
    val idx = scratchDir("graft-ivf")
    try {
      val e = t(s, dir, "embeddings")
      IvfIndex.build(idx, e, col("vec_id"), col("embedding"), IvfCfg)
      IvfIndex.topK(s, idx, e.filter(col("vec_id") < 8),
        col("vec_id"), col("embedding"), nProbe = 2, k = 3)
        .localCheckpoint(true) // materialize before the temp index is deleted
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(idx))
  }

  /** IVF quantizer parameters, shared with the oracle SQL generator and
    * with Bench.storeSplits (same-parameters contract as [[SigStoreCfg]]). */
  private val IvfC = 16
  private val IvfLloydIters = 2
  private[graft] val IvfCfg = graft.operators.IvfIndex.Config(IvfC, IvfLloydIters)

  /** Corpus-size-scaled sketch width for the embedding near-dup gate:
    * bits = min(24, bitlength(max(1, N / targetBucket))) — i.e. roughly
    * log2(N / 64), so the expected bucket size stays ~64 at ANY corpus size
    * instead of going N²/2^bits-quadratic with a frozen width. The 24-bit
    * ceiling (up from round 3's 16: 2^16·cap collided with real corpus sizes
    * — every bucket oversized ⇒ the cap silently dropped everything) covers
    * ~10^9 vectors at the default 64-row target; past it the BANDS below
    * keep recall from collapsing. Integer-exact (bin/length, no float log),
    * so the oracle derives the identical width from its own count(*). */
  private def nearDupBits(n: Long): Int =
    math.min(24, java.lang.Long.toBinaryString(math.max(1L, n / 64L)).length)

  /** Independent sketch tables for the banded near-dup gate (pair survives if
    * it meets in ANY band — a band whose bucket degenerates drops rows from
    * that band only). */
  private val NearDupBands = 2

  /** Embedding-cosine near-duplicate pairs: BANDED hyperplane gate
    * ([[graft.functions.AnnSearch.embedNearDupPairs]]) whose width scales
    * with the corpus (see [[nearDupBits]]; recall < 1 by construction, like
    * any LSH near-dup), degenerate buckets capped per band, survivors
    * verified by exact cosine ≥ 0.40. */
  private def qEmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{AnnSearch, TextDedup}
    val corpus = t(s, dir, "embeddings")
    val bits = nearDupBits(corpus.count())
    AnnSearch.embedNearDupPairs(corpus, "vec_id", "embedding",
      bitsPerBand = bits, bands = NearDupBands, minCosE4 = 4000L,
      bucketCap = TextDedup.DefaultBucketCap, planeDim = AnnSearch.OracleDim).pairs
  }

  /** Multimodal feature extraction over binary media columns: deterministic
    * PPM/BMP/WAV payloads are ENCODED from parameters derived off the
    * documents table, then PARSED BACK by the real byte-level container
    * decoder ([[graft.functions.Multimodal.decode]]) inside mapPartitions.
    * The DuckDB oracle computes every feature (including exact byte lengths,
    * with PPM's variable ASCII header and BMP's 4-byte row padding) in
    * closed form — so a hash match proves decode ∘ encode = identity on
    * every row, i.e. the parser reads real container headers correctly. */
  private def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.Multimodal
    val media = t(s, dir, "documents")
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val w = (16 + (id * 7) % 48).toInt
        val h = (16 + (id * 11) % 48).toInt
        id % 3 match {
          case 0 => Multimodal.MediaRow(id, "image_ppm", Multimodal.encodePpm(w, h, id), Map.empty)
          case 1 => Multimodal.MediaRow(id, "image_bmp", Multimodal.encodeBmp(w, h, id), Map.empty)
          case _ => Multimodal.MediaRow(id, "audio_wav",
            Multimodal.encodeWav((1 + id % 2).toInt, (8000 + 100 * (id % 5)).toInt,
              64 + (nChars % 128), id), Map.empty)
        }
      }
    Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("byte_len"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_samples").as("n_samples"))
  }

  private def multimodalOracleSql: String = {
    val w = "(16 + (doc_id*7) % 48)"
    val h = "(16 + (doc_id*11) % 48)"
    s"""SELECT doc_id AS media_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'image_ppm' WHEN 1 THEN 'image_bmp' ELSE 'audio_wav' END AS kind,
       |  (CASE doc_id % 3
       |    WHEN 0 THEN 3 + len($w::VARCHAR) + 1 + len($h::VARCHAR) + 5 + 3 * $w * $h
       |    WHEN 1 THEN 54 + ((($w*3 + 3) // 4) * 4) * $h
       |    ELSE 44 + (64 + (n_chars % 128)) * (1 + doc_id % 2) * 2
       |  END)::BIGINT AS byte_len,
       |  (CASE WHEN doc_id % 3 IN (0,1) THEN $w END)::BIGINT AS width,
       |  (CASE WHEN doc_id % 3 IN (0,1) THEN $h END)::BIGINT AS height,
       |  (CASE WHEN doc_id % 3 IN (0,1) THEN 3 ELSE 1 + doc_id % 2 END)::BIGINT AS channels,
       |  (CASE WHEN doc_id % 3 = 2 THEN 8000 + 100 * (doc_id % 5) END)::BIGINT AS sample_rate,
       |  (CASE WHEN doc_id % 3 = 2 THEN 64 + (n_chars % 128) END)::BIGINT AS n_samples
       |FROM documents""".stripMargin
  }

  // --------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_validate_project" -> (qValidateProject _),
    "cdc_filter_chain" -> (qFilterChain _),
    "cdc_table_filter" -> (qTableFilter _),
    "cdc_dedup_lww" -> (qDedupLww _),
    "cdc_merge_fold" -> (qMergeFold _),
    "cdc_time_travel" -> (qTimeTravel _),
    "cdc_change_feed" -> (qChangeFeed _),
    "cdc_session_agg" -> (qSessionAgg _),
    "cdc_key_builder" -> (qKeyBuilder _),
    "cdc_diff_changed" -> (qDiffChanged _),
    "cdc_fence_report" -> (qFenceReport _),
    "cdc_op_metrics" -> (qOpMetrics _),
    "cdc_enrich_broadcast" -> (qEnrichBroadcast _),
    "cdc_hot_keys" -> (qHotKeys _),
    "cdc_changed_fields" -> (qChangedFields _),
    "dedup_exact" -> (qDedupExact _),
    "doc_fingerprint" -> (qDocFingerprint _),
    "text_quality" -> (qTextQuality _),
    "text_langid" -> (qTextLangid _),
    "token_count" -> (qTokenCount _),
    "embed_norm" -> (qEmbedNorm _),
    "ann_cosine_topk" -> (qAnnCosineTopk _),
    "dedup_minhash_lsh" -> (qDedupMinhashLsh _),
    "dedup_incremental" -> (qDedupIncremental _),
    "dedup_simhash" -> (qDedupSimhash _),
    "text_jaccard_adjacent" -> (qTextJaccardAdjacent _),
    "ann_lsh_topk" -> (qAnnLshTopk _),
    "ann_ivf_topk" -> (qAnnIvfTopk _),
    "embed_near_dup" -> (qEmbedNearDup _),
    "multimodal_features" -> (qMultimodalFeatures _))

  // ---- generated oracle SQL for the hash-based operators (constants shared
  //      with the Spark plans via OracleHash) ----

  private def minhashOracleSql: String = {
    import graft.functions.OracleHash
    val k = 16; val bands = 4; val r = 4
    val as = OracleHash.coefA(k); val bs = OracleHash.coefB(k)
    val sigEntries = (0 until k).map { j =>
      s"list_aggregate(list_transform(hs, h -> (${as(j)}*h + ${bs(j)}) % ${OracleHash.P}), 'min')"
    }.mkString("[", ", ", "]")
    s"""WITH sh AS (SELECT doc_id AS doc, ${OracleHash.sqlShingles("text", 3)} AS sh FROM documents),
       |hs AS (SELECT doc, list_transform(sh, s -> ${OracleHash.sqlH32("s")}) AS hs FROM sh),
       |sig AS (SELECT doc, $sigEntries AS sig FROM hs),
       |banded AS (
       |  SELECT doc, sig, b::VARCHAR || '|' || array_to_string(sig[b*$r+1 : b*$r+$r], ',') AS bucket
       |  FROM sig, unnest(${(0 until bands).mkString("[", ",", "]")}) AS t(b)
       |  QUALIFY count(*) OVER (PARTITION BY bucket) <= ${graft.functions.TextDedup.DefaultBucketCap}),
       |pairs AS (
       |  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
       |    list_sum(list_transform(range(1, ${k + 1}),
       |      i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))::BIGINT AS cnt
       |  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.doc < b.doc)
       |SELECT id_a, id_b, CAST(round(cnt * 10000.0 / $k) AS BIGINT) AS est_e4
       |FROM pairs WHERE cnt::DOUBLE / $k >= 0.25""".stripMargin
  }

  /** Full-corpus recompute restricted to pairs with a batch side — the
    * incremental store must agree with this bit-for-bit (buckets a batch
    * touches are read in full, so the global bucket cap is observable
    * locally; see [[graft.operators.SigStore.incrementalPairs]]). */
  private def incrementalOracleSql: String = {
    import graft.functions.OracleHash
    val k = 16; val bands = 4; val r = 4
    val as = OracleHash.coefA(k); val bs = OracleHash.coefB(k)
    val sigEntries = (0 until k).map { j =>
      s"list_aggregate(list_transform(hs, h -> (${as(j)}*h + ${bs(j)}) % ${OracleHash.P}), 'min')"
    }.mkString("[", ", ", "]")
    s"""WITH sh AS (SELECT doc_id AS doc, ${OracleHash.sqlShingles("text", 3)} AS sh FROM documents),
       |hs AS (SELECT doc, list_transform(sh, s -> ${OracleHash.sqlH32("s")}) AS hs FROM sh),
       |sig AS (SELECT doc, $sigEntries AS sig FROM hs),
       |banded AS (
       |  SELECT doc, sig, b::VARCHAR || '|' || array_to_string(sig[b*$r+1 : b*$r+$r], ',') AS bucket
       |  FROM sig, unnest(${(0 until bands).mkString("[", ",", "]")}) AS t(b)
       |  QUALIFY count(*) OVER (PARTITION BY bucket) <= ${graft.functions.TextDedup.DefaultBucketCap}),
       |pairs AS (
       |  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
       |    list_sum(list_transform(range(1, ${k + 1}),
       |      i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))::BIGINT AS cnt
       |  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.doc < b.doc
       |  WHERE a.doc % 10 = 0 OR b.doc % 10 = 0)
       |SELECT id_a, id_b, CAST(round(cnt * 10000.0 / $k) AS BIGINT) AS est_e4
       |FROM pairs WHERE cnt::DOUBLE / $k >= 0.25""".stripMargin
  }

  private def simhashOracleSql: String = {
    import graft.functions.OracleHash
    val maxHamming = 6; val nBands = maxHamming + 1; val width = 62 / nBands
    val lastMask = (1L << (62 - (nBands - 1) * width)) - 1L
    val mask = (1L << width) - 1L
    s"""WITH sh AS (SELECT doc_id AS doc, ${OracleHash.sqlShingles("text", 3)} AS sh FROM documents),
       |hc AS (SELECT doc, list_transform(sh, s -> ${OracleHash.sqlH62("md5(s)")}) AS hs FROM sh),
       |sk AS (SELECT doc, list_sum(list_transform(range(0, 62), i ->
       |    CASE WHEN list_sum(list_transform(hs,
       |           h -> CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END)) > 0
       |         THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS sketch FROM hc),
       |blocked AS (
       |  SELECT doc, sketch, q,
       |         (sketch >> (q * $width)) & (CASE WHEN q = ${nBands - 1} THEN $lastMask ELSE $mask END) AS block
       |  FROM sk, unnest(${(0 until nBands).mkString("[", ",", "]")}) AS t(q)
       |  QUALIFY count(*) OVER (PARTITION BY q, block) <= ${graft.functions.TextDedup.DefaultBucketCap})
       |SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
       |       bit_count(xor(a.sketch, b.sketch))::BIGINT AS hamming
       |FROM blocked a JOIN blocked b ON a.q = b.q AND a.block = b.block AND a.doc < b.doc
       |WHERE bit_count(xor(a.sketch, b.sketch)) <= $maxHamming""".stripMargin
  }

  /** sketch CTE body shared by the LSH-shaped oracles: per-vector H-bit
    * hyperplane bucket from the same integer plane table the Spark plan bakes
    * in (both sides use exactly the first [[graft.functions.AnnSearch.OracleDim]]
    * plane components; the Spark query raises on wider vectors). `bitsSql`
    * may be a literal or a scalar-subquery expression (corpus-scaled width);
    * the plane table is baked at `maxBits` rows. */
  private def sqlSketchCtes(bitsSql: String, maxBits: Int): String = {
    import graft.functions.{AnnSearch, OracleHash}
    val planes = OracleHash.sqlLongListList(
      OracleHash.planeInts(maxBits, AnnSearch.MaxDim).map(_.take(AnnSearch.OracleDim)))
    // plane rows hoisted into a per-q CTE instead of indexing the matrix
    // literal inside a doubly-nested lambda — the literal-in-lambda form made
    // DuckDB grind ~interpreted over rows × bits × dims (ann_lsh_topk sat
    // >10 min at sf1's 20k vectors); this computes each bit as a ROW against
    // a plane COLUMN and rebuilds the bucket with an integer SUM over
    // disjoint powers of two — value-identical (the inner float sum keeps the
    // same per-element order), sf1 in seconds. Same fix, same reasoning as
    // embedNearDupOracleSql below.
    s"""WITH e AS (SELECT vec_id, embedding,
       |        sqrt(list_dot_product(embedding, embedding)) AS nrm FROM embeddings),
       |pl AS (
       |  SELECT q, ($planes)[q + 1] AS plane
       |  FROM unnest(range(0, $bitsSql)) AS r(q)),
       |bitrows AS (
       |  SELECT e.vec_id,
       |    CASE WHEN list_sum(list_transform(range(1, len(e.embedding) + 1), i ->
       |           e.embedding[i] * (pl.plane[i] / 100000.0 - 0.5))) > 0
       |         THEN (1::BIGINT << pl.q) ELSE 0 END AS b
       |  FROM e, pl),
       |sk AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, s.bucket
       |  FROM e JOIN (SELECT vec_id, sum(b)::BIGINT AS bucket
       |               FROM bitrows GROUP BY vec_id) s USING (vec_id))""".stripMargin
  }

  private def annLshOracleSql: String = {
    val bits = 8
    val flips = (0 until bits).map(b => s"xor(bucket, ${1L << b})").mkString(", ")
    s"""${sqlSketchCtes(bits.toString, bits)},
       |probes AS (
       |  SELECT vec_id AS query_id, embedding AS qe, nrm AS qn,
       |         unnest([bucket, $flips]) AS bucket
       |  FROM sk WHERE vec_id < 8),
       |cand AS (
       |  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
       |     CAST(round(list_dot_product(p.qe, c.embedding) / (p.qn * c.nrm) * 10000) AS BIGINT) AS cos_e4
       |  FROM probes p JOIN sk c ON p.bucket = c.bucket
       |  WHERE c.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, cos_e4, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |            ORDER BY cos_e4 DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM cand) WHERE rank <= 3""".stripMargin
  }

  /** IVF oracle: DuckDB RE-TRAINS the quantizer — the same seed, the same 2
    * Lloyd iterations, the same fixed-point integer means as
    * AnnSearch.lloydCentroids — so centroids, assignments, and the final
    * top-k agree bit-for-bit with the Spark plan. */
  private def annIvfOracleSql: String = {
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, embedding, nrm, cent_id FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             CAST(round(list_dot_product(e.embedding, c.cvec) / (e.nrm * c.cnrm) * 1e9) AS BIGINT) DESC,
         |             c.cent_id) AS rn
         |    FROM e, $cents c) WHERE rn = 1)""".stripMargin
    def lloydCte(i: Int, prevAssign: String): String =
      s"""s$i AS (
         |  SELECT cent_id, u.i AS i,
         |         CAST(round(sum(CAST(round(u.x::DOUBLE * 1000000) AS BIGINT))::DOUBLE / count(*)) AS BIGINT) AS f
         |  FROM (SELECT cent_id, unnest(list_transform(range(1, len(embedding) + 1),
         |          i -> {'i': i, 'x': embedding[i]})) AS u FROM $prevAssign)
         |  GROUP BY cent_id, u.i),
         |c$i AS (SELECT cent_id, list(f / 1000000.0 ORDER BY i) AS cvec FROM s$i GROUP BY cent_id),
         |c${i}n AS (SELECT cent_id, cvec, sqrt(list_dot_product(cvec, cvec)) AS cnrm FROM c$i)""".stripMargin
    val iterCtes = (1 to IvfLloydIters).map { i =>
      val prev = if (i == 1) "c0" else s"c${i - 1}n"
      s"${assignCte(s"a${i - 1}", prev)},\n${lloydCte(i, s"a${i - 1}")}"
    }.mkString(",\n")
    val fc = s"c${IvfLloydIters}n"
    s"""WITH e AS (SELECT vec_id, embedding,
       |        sqrt(list_dot_product(embedding, embedding)) AS nrm FROM embeddings),
       |c0 AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cvec,
       |              sqrt(list_dot_product(embedding, embedding)) AS cnrm
       |       FROM e WHERE vec_id < $IvfC),
       |$iterCtes,
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cent_id FROM (
       |    SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             CAST(round(list_dot_product(e.embedding, c.cvec) / (e.nrm * c.cnrm) * 1e9) AS BIGINT) DESC,
       |             c.cent_id) AS rn
       |    FROM e, $fc c) WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, qe, qn, cent_id FROM (
       |    SELECT a.vec_id AS query_id, a.embedding AS qe, a.nrm AS qn, c.cent_id,
       |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |             CAST(round(list_dot_product(a.embedding, c.cvec) / (a.nrm * c.cnrm) * 1e9) AS BIGINT) DESC,
       |             c.cent_id) AS rn
       |    FROM e a, $fc c WHERE a.vec_id < 8) WHERE rn <= 2),
       |cand AS (
       |  SELECT DISTINCT p.query_id, x.vec_id AS neighbor_id,
       |         CAST(round(list_dot_product(p.qe, x.embedding) / (p.qn * x.nrm) * 10000) AS BIGINT) AS cos_e4
       |  FROM probes p JOIN assigned x ON x.cent_id = p.cent_id
       |  WHERE x.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, cos_e4, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |            ORDER BY cos_e4 DESC, neighbor_id) AS BIGINT) AS rank FROM cand)
       |WHERE rank <= 3""".stripMargin
  }

  private def embedNearDupOracleSql: String = {
    import graft.functions.{AnnSearch, OracleHash, TextDedup}
    // corpus-scaled width (same integer-exact bitlength formula as
    // nearDupBits, derived from the oracle's own count(*)) × NearDupBands
    // independent tables: band b's bit q reads plane row band*bits + q from
    // the SAME baked table the Spark plan indexes (hyperplaneSketchAt)
    val planes = OracleHash.sqlLongListList(
      OracleHash.planeInts(24 * NearDupBands, AnnSearch.MaxDim).map(_.take(AnnSearch.OracleDim)))
    val bandsList = (0 until NearDupBands).mkString("[", ",", "]")
    // the plane matrix is hoisted into a per-(band,q) CTE row instead of
    // being indexed inside a doubly-nested lambda: the literal-in-lambda form
    // made DuckDB grind ~interpreted over rows × bands × bits × dims (3.8 h
    // unfinished at sf1's 20k vectors); this form computes each bit as a ROW
    // against a plane COLUMN and rebuilds the bucket with an integer SUM —
    // value-identical (inner float sum keeps the same per-element order, the
    // outer sum is over disjoint powers of two), sf1 in seconds
    // fixed-point norms/dots mirror the Spark side exactly (see
    // AnnSearch.embedNearDupPairs): per-element product rounded to a 1e-6
    // grid once, summed as BIGINTs — accumulation-order-independent, so the
    // rounded cosine can never disagree by a last-ulp tie
    s"""WITH e AS (SELECT vec_id, embedding,
       |        CAST(list_sum(list_transform(range(1, len(embedding) + 1), i ->
       |          CAST(round(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1e6)
       |            AS BIGINT))) AS BIGINT) AS n2 FROM embeddings),
       |p AS (SELECT least(24, length(bin(greatest(1, count(*) // 64))))::INT AS bits FROM embeddings),
       |pl AS (
       |  SELECT band, q, ($planes)[band*bits + q + 1] AS plane
       |  FROM p, unnest($bandsList) AS t(band), unnest(range(0, bits)) AS r(q)),
       |bitrows AS (
       |  SELECT e.vec_id, pl.band,
       |    CASE WHEN list_sum(list_transform(range(1, len(e.embedding) + 1), i ->
       |           e.embedding[i] * (pl.plane[i] / 100000.0 - 0.5))) > 0
       |         THEN (1::BIGINT << pl.q) ELSE 0 END AS b
       |  FROM e, pl),
       |sk AS (
       |  SELECT e.vec_id, e.embedding, e.n2, s.band, s.bucket
       |  FROM e JOIN (SELECT vec_id, band, sum(b)::BIGINT AS bucket
       |               FROM bitrows GROUP BY vec_id, band) s USING (vec_id)),
       |capped AS (
       |  SELECT * FROM sk
       |  QUALIFY count(*) OVER (PARTITION BY band, bucket) <= ${TextDedup.DefaultBucketCap}),
       |scored AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       |    CAST(round(CAST(CAST(list_sum(list_transform(range(1, len(a.embedding) + 1), i ->
       |        CAST(round(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1e6)
       |          AS BIGINT))) AS BIGINT) AS DOUBLE)
       |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) * 10000) AS BIGINT) AS cos_e4
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cos_e4 FROM scored WHERE cos_e4 >= 4000""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "dedup_minhash_lsh" -> minhashOracleSql,
    "dedup_incremental" -> incrementalOracleSql,
    "dedup_simhash" -> simhashOracleSql,
    "ann_lsh_topk" -> annLshOracleSql,
    "ann_ivf_topk" -> annIvfOracleSql,
    "embed_near_dup" -> embedNearDupOracleSql,
    "multimodal_features" -> multimodalOracleSql,

    "cdc_changed_fields" ->
      """SELECT user_id, event_id,
        |  concat_ws(',',
        |    CASE WHEN event_type IS DISTINCT FROM prev_type THEN 'event_type' END,
        |    CASE WHEN value IS DISTINCT FROM prev_value THEN 'value' END) AS changed
        |FROM (SELECT user_id, event_id, event_type, value,
        |        lag(event_type) OVER w AS prev_type,
        |        lag(value) OVER w AS prev_value,
        |        lag(event_id) OVER w AS prev_id
        |      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |WHERE prev_id IS NOT NULL
        |  AND (event_type IS DISTINCT FROM prev_type OR value IS DISTINCT FROM prev_value)""".stripMargin,

    "cdc_validate_project" ->
      s"""SELECT event_id, user_id, op FROM (
         |  SELECT event_id, user_id, $opSql AS op FROM events
         |) WHERE op IN ('insert','update','delete')""".stripMargin,

    "cdc_filter_chain" ->
      s"""SELECT event_id, user_id, event_type, value FROM (
         |  SELECT *, $opSql AS op FROM events
         |) WHERE op IN ('insert','update')
         |  AND (user_id % 10) NOT IN (3, 7) AND value > 5.0""".stripMargin,

    "cdc_table_filter" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_type IN ('click','view','purchase')
        |  AND event_type NOT IN ('view')
        |GROUP BY event_type""".stripMargin,

    "cdc_dedup_lww" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,

    "cdc_merge_fold" ->
      s"""SELECT user_id, event_id AS last_event_id, op, value AS last_value
         |FROM (SELECT *, $opSql AS op,
         |             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
         |      FROM events) WHERE rn = 1 AND op <> 'delete'""".stripMargin,

    // Two-phase replay fixture shared by the lake-path oracles: the filtered
    // changelog, its midpoint split, and the LWW winner per key at split (w1)
    // and at end (w2). The Spark side runs the REAL LakeTable machinery
    // (replay → snapshots → time travel / change feed); DuckDB re-derives the
    // same states straight from the events.
    "cdc_time_travel" ->
      s"""WITH ops AS (SELECT user_id, event_id, event_type, value, $opSql AS op FROM events),
         |ro AS (SELECT * FROM ops WHERE op IN ('insert','update','delete')),
         |sp AS (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) AS s FROM ro),
         |w1 AS (SELECT * FROM (
         |  SELECT ro.*, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
         |  FROM ro WHERE event_id <= (SELECT s FROM sp)) WHERE rn = 1)
         |SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
         |       CAST(round(value * 100) AS BIGINT) AS cents
         |FROM w1 WHERE op <> 'delete'""".stripMargin,

    "cdc_change_feed" ->
      s"""WITH ops AS (SELECT user_id, event_id, event_type, value, $opSql AS op FROM events),
         |ro AS (SELECT * FROM ops WHERE op IN ('insert','update','delete')),
         |sp AS (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) AS s FROM ro),
         |w1 AS (SELECT * FROM (
         |  SELECT ro.*, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
         |  FROM ro WHERE event_id <= (SELECT s FROM sp)) WHERE rn = 1),
         |w2 AS (SELECT * FROM (
         |  SELECT ro.*, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
         |  FROM ro) WHERE rn = 1),
         |o AS (SELECT * FROM w1 WHERE op <> 'delete'),
         |cls AS (
         |  SELECT n.user_id,
         |    CASE WHEN n.op <> 'delete' AND o.user_id IS NULL THEN 'insert'
         |         WHEN n.op <> 'delete' AND o.user_id IS NOT NULL AND n.event_id <> o.event_id THEN 'update'
         |         WHEN n.op = 'delete' AND o.user_id IS NOT NULL THEN 'delete' END AS change_op,
         |    n.event_id AS seq,
         |    CASE WHEN n.op = 'delete' THEN o.event_id ELSE n.event_id END AS carried_event_id,
         |    CASE WHEN n.op = 'delete' THEN o.event_type ELSE n.event_type END AS carried_event_type,
         |    CAST(round((CASE WHEN n.op = 'delete' THEN o.value ELSE n.value END) * 100) AS BIGINT) AS carried_cents
         |  FROM w2 n LEFT JOIN o ON n.user_id = o.user_id)
         |SELECT * FROM cls WHERE change_op IS NOT NULL""".stripMargin,

    "cdc_session_agg" ->
      """WITH t AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS session_id FROM t
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, min(us) AS session_start_us,
        |       count(*) AS n_events,
        |       CAST(round(sum(value) * 100) AS BIGINT) AS value_cents
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "cdc_key_builder" ->
      """SELECT event_type || ',' || 'u' || ':' || CAST(user_id AS VARCHAR) AS key,
        |       count(*) AS n, CAST(round(sum(value) * 100) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1""".stripMargin,

    "cdc_diff_changed" ->
      """SELECT user_id,
        |       CAST(sum(CASE WHEN prev IS NOT NULL AND value <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |       count(*) AS n_events
        |FROM (SELECT user_id, value,
        |             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |      FROM events) GROUP BY user_id""".stripMargin,

    "cdc_fence_report" ->
      """SELECT user_id % 8 AS log_partition, max(event_id) AS fence_offset,
        |       count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "cdc_op_metrics" ->
      s"""SELECT op, count(*) AS n, count(DISTINCT user_id) AS n_users,
         |       CAST(round(sum(value) * 100) AS BIGINT) AS value_cents
         |FROM (SELECT *, $opSql AS op FROM events) GROUP BY op""".stripMargin,

    "cdc_enrich_broadcast" ->
      """SELECT n.n_name, count(*) AS n,
        |       CAST(round(sum(e.value) * 100) AS BIGINT) AS value_cents
        |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin,

    "cdc_hot_keys" ->
      """SELECT user_id, n, rank FROM (
        |  SELECT user_id, count(*) AS n,
        |         CAST(row_number() OVER (ORDER BY count(*) DESC, user_id) AS BIGINT) AS rank
        |  FROM events GROUP BY user_id
        |) WHERE rank <= 10""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp, count(*) AS n, min(doc_id) AS keeper
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "doc_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp, n_chars FROM documents",

    "text_quality" ->
      """SELECT doc_id, length(text) AS n_char,
        |       length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
        |       length(text) - length(replace(text, '.', '')) AS n_period,
        |       length(text) - length(replace(text, ',', '')) AS n_comma
        |FROM documents""".stripMargin,

    "text_langid" ->
      """SELECT doc_id,
        |  length(text) - length(replace(text, ' the ', '')) AS cnt_en,
        |  length(text) - length(replace(text, ' und ', '')) AS cnt_de,
        |  length(text) - length(replace(text, ' les ', '')) AS cnt_fr,
        |  length(text) - length(replace(text, ' los ', '')) AS cnt_es,
        |  CASE WHEN greatest(
        |         length(text) - length(replace(text, ' the ', '')),
        |         length(text) - length(replace(text, ' und ', '')),
        |         length(text) - length(replace(text, ' les ', '')),
        |         length(text) - length(replace(text, ' los ', ''))) = 0 THEN 'other'
        |       WHEN length(text) - length(replace(text, ' the ', '')) >= greatest(
        |         length(text) - length(replace(text, ' und ', '')),
        |         length(text) - length(replace(text, ' les ', '')),
        |         length(text) - length(replace(text, ' los ', ''))) THEN 'en'
        |       WHEN length(text) - length(replace(text, ' und ', '')) >= greatest(
        |         length(text) - length(replace(text, ' les ', '')),
        |         length(text) - length(replace(text, ' los ', ''))) THEN 'de'
        |       WHEN length(text) - length(replace(text, ' les ', '')) >=
        |            length(text) - length(replace(text, ' los ', '')) THEN 'fr'
        |       ELSE 'es' END AS predicted
        |FROM documents""".stripMargin,

    "text_jaccard_adjacent" ->
      """WITH w AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(text, '\s+'))) AS w
        |           FROM documents),
        |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |          FROM w a JOIN w b ON b.w = a.w AND b.doc_id = a.doc_id + 1
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       CAST(round(inter * 10000.0 / (sa.sz + sb.sz - inter)) AS BIGINT) AS jaccard_e4
        |FROM inter
        |JOIN sz sa ON sa.doc_id = id_a
        |JOIN sz sb ON sb.doc_id = id_b""".stripMargin,

    "token_count" ->
      """SELECT doc_id,
        |       length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
        |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
        |FROM documents""".stripMargin,

    "embed_norm" ->
      """SELECT vec_id, len(embedding) AS dim,
        |       CAST(round(sqrt(CAST(sum(CAST(round(
        |         CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e6) AS BIGINT))
        |         AS DOUBLE) / 1e6) * 10000) AS BIGINT) AS norm_e4
        |FROM (SELECT vec_id, embedding, unnest(embedding) AS x FROM embeddings)
        |GROUP BY vec_id, len(embedding)""".stripMargin,

    "ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q.qid, e.vec_id,
        |         CAST(round(
        |           list_dot_product(q.qe, e.embedding) /
        |           (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.embedding, e.embedding)))
        |           * 10000) AS BIGINT) AS cos_e4
        |  FROM q, embeddings e WHERE e.vec_id <> q.qid
        |)
        |SELECT qid, vec_id, cos_e4, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_e4 DESC, vec_id) AS BIGINT) AS rank
        |  FROM pairs
        |) WHERE rank <= 3""".stripMargin)
}
