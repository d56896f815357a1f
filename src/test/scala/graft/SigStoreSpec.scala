package graft

import graft.functions.TextDedup
import graft.operators.SigStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted signature store: the incremental near-dup shape.
  *
  * Contract under test (see SigStore scaladoc): `incrementalPairs(batch)`
  * over a store holding corpus state C equals `minHashLshPairs(C ⊕ batch)`
  * restricted to pairs with at least one side in the batch — across inserts,
  * updates (signatures move buckets), deletes (tombstoned heads), and
  * re-deliveries (append-only idempotence) — while reading ONLY the LSH
  * shards the batch's buckets hash into.
  */
class SigStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = SigStore.Config(shingleLen = 3, bands = 4, rowsPerBand = 4,
    shards = 16)

  /** Deterministic docs: clusters of near-duplicates (same base sentence,
    * one token mutated) so LSH actually produces pairs. Zero-padded string
    * ids keep string '<' consistent with logical order on both sides. */
  private def doc(i: Int, version: Int = 0): (String, String) = {
    val base = s"the quick brown fox ${i / 4} jumps over the lazy dog " +
      s"while counting ${i / 4} silver coins in the old stone tower v$version"
    val mut = s" variant ${i % 4}"
    (f"d$i%03d", base + mut)
  }

  private def docsDF(pairs: Seq[(String, String)]): DataFrame =
    pairs.toDF("doc_id", "text")

  /** Event-shaped frame for maintainFromEvents (repo = "corp", path = id). */
  private def eventsDF(rows: Seq[(String, String, String, Long)]): DataFrame =
    rows.toDF("path", "text", "op", "seq").select(
      lit("corp").as("repo"), col("path"), col("op"), col("seq"),
      when(col("op") =!= "delete",
        struct(lit("corp").as("repo"), col("path"), lit("c0").as("commit"),
          lit("txt").as("lang"), col("text").as("content"))).as("after"))

  /** Doc key as the store builds it from events: repo/path. */
  private def k(id: String): String = s"corp/$id"

  private def expectedPairs(corpus: Seq[(String, String)],
      batchIds: Set[String]): Set[(String, String, Double)] =
    TextDedup.minHashLshPairs(docsDF(corpus), "doc_id", "text",
        shingleLen = cfg.shingleLen, bands = cfg.bands,
        rowsPerBand = cfg.rowsPerBand, minEst = 0.3, bucketCap = cfg.bucketCap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .filter(p => batchIds.contains(p._1) || batchIds.contains(p._2)).toSet

  private def gotPairs(store: String, batch: Seq[(String, String)]): Set[(String, String, Double)] =
    SigStore.incrementalPairs(spark, store, docsDF(batch),
        col("doc_id"), col("text"), cfg, minEst = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

  test("incremental pairs equal the full recompute across insert/update/delete") {
    val store = TestSpark.tmpDir("graft-sig-store")
    // keys are repo/path-shaped throughout (the shape maintainFromEvents
    // writes), so the initial bulk load and later CDC batches share keys
    val corpus0 = (0 until 60).map(doc(_)).map { case (id, tx) => (k(id), tx) }
    SigStore.appendUpserts(store, docsDF(corpus0), col("doc_id"), col("text"),
      lit(1L), cfg)

    // fresh batch of new docs: near-dups of existing clusters
    val batch1 = (60 until 68).map(doc(_)).map { case (id, tx) => (k(id), tx) }
    val got1 = gotPairs(store, batch1)
    assert(got1 === expectedPairs(corpus0 ++ batch1, batch1.map(_._1).toSet))
    assert(got1.nonEmpty, "fixture must produce store-vs-batch pairs")

    // CDC batch: update 4 docs (text moves to new clusters ⇒ buckets move
    // between shards), insert 2, delete 2 (one of them near-identical to a
    // later batch doc — its pair must vanish with it)
    val updated = (0 until 4).map(i => doc(i, version = 9))
    val inserted = Seq(doc(70), doc(71))
    val deleted = Seq("d040", "d041")
    SigStore.maintainFromEvents(store, eventsDF(
      updated.map { case (id, tx) => (id, tx, "update", 100L + id.drop(1).toInt) } ++
        inserted.map { case (id, tx) => (id, tx, "insert", 200L + id.drop(1).toInt) } ++
        deleted.map(id => (id, null, "delete", 300L + id.drop(1).toInt))), cfg)

    val corpus1 = (corpus0.toMap --
      deleted.map(k) ++
      (updated ++ inserted).map { case (id, tx) => (k(id), tx) }).toSeq
    val batch2 = Seq(doc(40, version = 0), doc(80), doc(0, version = 5))
      .map { case (id, tx) => (k(id), tx) }
    // batch docs REPLACE their store rows (d000's v5 text supersedes v9;
    // d040 was deleted and comes back with its old text)
    val composed = (corpus1.toMap ++ batch2).toSeq
    assert(gotPairs(store, batch2) ===
      expectedPairs(composed, batch2.map(_._1).toSet))
  }

  test("re-delivery is harmless: retried and stale events never change served pairs") {
    val store = TestSpark.tmpDir("graft-sig-redeliver")
    val corpus = (0 until 24).map(doc(_)).map { case (id, tx) => (k(id), tx) }
    SigStore.appendUpserts(store, docsDF(corpus), col("doc_id"), col("text"),
      lit(1L), cfg)
    val up = Seq((doc(0, 7)._1, doc(0, 7)._2, "update", 50L))
    SigStore.maintainFromEvents(store, eventsDF(up), cfg)
    val batch = Seq(doc(90)).map { case (id, tx) => (k(id), tx) }
    val corpusK = (corpus.toMap + (k(doc(0, 7)._1) -> doc(0, 7)._2)).toSeq
    val want = expectedPairs(corpusK ++ batch, batch.map(_._1).toSet)
    assert(gotPairs(store, batch) === want)
    // exact retry of the same maintenance batch (stream retry after a crash
    // between sink write and checkpoint commit)
    SigStore.maintainFromEvents(store, eventsDF(up), cfg)
    assert(gotPairs(store, batch) === want)
    // stale re-delivery: the ORIGINAL v0 content arrives again with an old
    // seq — below the head, so reads must keep serving v7
    SigStore.maintainFromEvents(store,
      eventsDF(Seq((doc(0)._1, doc(0)._2, "update", 1L))), cfg)
    assert(gotPairs(store, batch) === want)
  }

  test("a null-content winner advances the head: old signature dies, stale content can't resurrect it") {
    val store = TestSpark.tmpDir("graft-sig-nullcontent")
    val corpus = (0 until 24).map(doc(_)).map { case (id, tx) => (k(id), tx) }
    SigStore.appendUpserts(store, docsDF(corpus), col("doc_id"), col("text"),
      lit(1L), cfg)
    // a fresh batch doc sharing d000's cluster text pairs with d000..d003
    val batch = Seq((k("d900"), doc(1)._2))
    val got0 = gotPairs(store, batch)
    assert(got0.exists(p => p._1 == k("d000") || p._2 == k("d000")),
      "fixture must pair the batch doc with d000 before the null-content update")
    // update that NULLS d000's content: the table row's content becomes null
    // (MergeApply image-overwrite — only image-ABSENT columns are preserved),
    // so d000 must stop producing pairs even though no new signature exists
    SigStore.maintainFromEvents(store,
      eventsDF(Seq(("d000", null, "update", 50L))), cfg)
    val corpusSansD0 = corpus.filterNot(_._1 == k("d000"))
    val want = expectedPairs(corpusSansD0 ++ batch, batch.map(_._1).toSet)
    assert(gotPairs(store, batch) === want)
    // stale re-delivery of d000's ORIGINAL content below the advanced head:
    // must stay dead (this is the window a non-advancing head would reopen)
    SigStore.maintainFromEvents(store,
      eventsDF(Seq(("d000", doc(0)._2, "update", 2L))), cfg)
    assert(gotPairs(store, batch) === want)
  }

  test("store reads are partition-pruned: a poisoned untouched shard is never opened") {
    val store = TestSpark.tmpDir("graft-sig-prune")
    val corpus = (0 until 60).map(doc(_))
    SigStore.appendUpserts(store, docsDF(corpus), col("doc_id"), col("text"),
      lit(1L), cfg)
    val batch = Seq(doc(60), doc(61))
    // shards the batch's buckets hash into — the ONLY sig shards a pruned
    // read may open
    val touched = SigStore.batchShards(docsDF(batch), col("doc_id"),
      col("text"), cfg)
    assert(touched.size < cfg.shards, "fixture must leave untouched shards")
    val untouched = (0 until cfg.shards).filterNot(touched.contains)
    // poison: a corrupt parquet file in every untouched shard dir — any scan
    // that lists-and-reads one of them fails loudly
    untouched.foreach { sp =>
      val d = java.nio.file.Paths.get(store, "sig", s"sp=$sp")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("poison.parquet"),
        "not a parquet file".getBytes)
      ()
    }
    // the poison is real: an UNPRUNED read of the sig tree must fail
    intercept[Exception] {
      spark.read.parquet(s"$store/sig").agg(count(lit(1))).collect()
    }
    // ...but the pruned incremental read never opens those directories
    val got = gotPairs(store, batch)
    assert(got === expectedPairs(corpus ++ batch, batch.map(_._1).toSet))
  }
}
