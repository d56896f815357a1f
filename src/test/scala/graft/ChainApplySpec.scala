package graft

import graft.gen.{ChangelogGen, GenConfig}
import graft.ingest.{ChainApply, Ingest}
import graft.lake.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chained (derived) tables: `ChainApply.sync` must keep a downstream
  * LakeTable bit-identical to the source by consuming only the source's
  * change feed — across multi-stage syncs, re-syncs (exactly-once via the
  * version-as-batchId fence), MOR sources with live deltas, subset filters,
  * schema evolution, and a second-hop chain (bronze → silver → gold).
  */
class ChainApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cfg = GenConfig(seed = 31L, nEvents = 10000L, nRepos = 40,
    pathsPerRepo = 12, skew = 3.0, nPartitions = 4, contentLen = 80)

  private def rows(t: LakeTable): Set[(String, String, String)] =
    t.read().select(col("repo"), col("path"), sha2(col("content"), 256))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  private def freshPair(morSrc: Boolean): (LakeTable, LakeTable, DataFrame, Long) = {
    val srcDir = TestSpark.tmpDir("graft-chain-src")
    val dstDir = TestSpark.tmpDir("graft-chain-dst")
    val src = LakeTable.create(spark, srcDir, numBuckets = 16)
    val dst = LakeTable.create(spark, dstDir, numBuckets = 16)
    val log = ChangelogGen.events(spark, cfg).toDF()
    val split = cfg.nEvents / 2
    val icfg = Ingest.IngestConfig(morMode = morSrc)
    Ingest.replayLog(src, log.filter(col("seq") <= split), icfg)
    (src, dst, log, split)
  }

  test("two-stage sync converges bit-exactly; re-sync is an exact no-op") {
    val (src, dst, log, split) = freshPair(morSrc = false)
    val r1 = ChainApply.sync(src, dst)
    assert(r1.applied > 0 && r1.toVersion === src.snapshot.version)
    assert(rows(dst) === rows(src), "after first sync")

    Ingest.replayLog(src, log.filter(col("seq") > split))
    val r2 = ChainApply.sync(src, dst)
    assert(r2.fromVersion === r1.toVersion && r2.applied > 0)
    assert(rows(dst) === rows(src), "after second sync")

    // exactly-once: same source head ⇒ version-as-batchId fence no-op
    val v = dst.snapshot.version
    val r3 = ChainApply.sync(src, dst)
    assert(r3.applied === 0L && dst.refresh().version === v)
  }

  test("MOR source with live unfolded deltas chains correctly") {
    val (src, dst, log, split) = freshPair(morSrc = true)
    Ingest.replayLog(src, log.filter(col("seq") > split),
      Ingest.IngestConfig(morMode = true))
    assert(src.snapshot.deltaFiles.nonEmpty, "fixture must have live deltas")
    ChainApply.sync(src, dst)
    assert(rows(dst) === rows(src))
  }

  test("filtered chain derives an exact subset on a key predicate") {
    val (src, dst, log, split) = freshPair(morSrc = false)
    val keep = col("repo").endsWith("1")
    ChainApply.sync(src, dst, rowFilter = keep)
    Ingest.replayLog(src, log.filter(col("seq") > split))
    ChainApply.sync(src, dst, rowFilter = keep)
    val want = src.read().filter(keep)
      .select(col("repo"), col("path"), sha2(col("content"), 256))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows(dst) === want)
    assert(want.nonEmpty && want.size < rows(src).size)
  }

  test("schema evolution propagates: destination gains the source's columns") {
    val c = cfg.copy(seed = 8L, nEvents = 8000L, ddlEvery = 1500L)
    val srcDir = TestSpark.tmpDir("graft-chain-ddl-src")
    val dstDir = TestSpark.tmpDir("graft-chain-ddl-dst")
    val src = LakeTable.create(spark, srcDir, numBuckets = 16)
    val dst = LakeTable.create(spark, dstDir, numBuckets = 16)
    val log = ChangelogGen.events(spark, c).toDF()
    val split = c.nEvents / 2
    Ingest.replayLog(src, log.filter(col("seq") <= split))
    ChainApply.sync(src, dst)
    Ingest.replayLog(src, log.filter(col("seq") > split))
    ChainApply.sync(src, dst)
    assert(src.refresh().schema.columns.size > 5, "fixture must evolve")
    val srcCols = src.schema.columns.map(_.name).toSet
    assert(srcCols.subsetOf(dst.refresh().schema.columns.map(_.name).toSet))
    // full-row equality over every shared column, not just content
    val cols = src.schema.columns.map(_.name)
    def all(t: LakeTable) = t.read()
      .select(cols.map(n => col(n).cast("string")): _*)
      .collect().map(_.toSeq).toSet
    assert(all(dst) === all(src))
  }

  test("fresh destination bootstraps off an aged source (expired early snapshots); expired cursor fails clearly") {
    val (src, dst, log, split) = freshPair(morSrc = false)
    Ingest.replayLog(src, log.filter(col("seq") > split))
    graft.lake.Maintenance.expireSnapshots(src, keep = 2, graceMs = 0L)
    intercept[Exception](src.snapshotAt(0L)) // fixture: v0 really is gone

    // bootstrap: full-state seed, no dependence on v0..N retention
    val r = ChainApply.sync(src, dst)
    assert(r.fromVersion === 0L && r.applied > 0)
    assert(rows(dst) === rows(src))

    // an EXPIRED cursor (not a fresh dst) must fail with a clear error
    (1 to 3).foreach(_ => graft.lake.Maintenance.compact(src, force = true))
    graft.lake.Maintenance.expireSnapshots(src, keep = 2, graceMs = 0L)
    val ex = intercept[IllegalStateException](ChainApply.sync(src, dst))
    assert(ex.getMessage.contains("re-bootstrap"))
  }

  test("source rename_column propagates as a rename, not a null new column") {
    import graft.ingest.MergeApply
    val srcDir = TestSpark.tmpDir("graft-chain-ren-src")
    val dstDir = TestSpark.tmpDir("graft-chain-ren-dst")
    val src = LakeTable.create(spark, srcDir, numBuckets = 4)
    val dst = LakeTable.create(spark, dstDir, numBuckets = 4)
    src.evolveSchema(_.addColumn("x", "string"))
    def batch(ids: Seq[Int], seqBase: Long, xv: String) = {
      import spark.implicits._
      ids.toDF("id").select(
        lit("r").as("repo"), concat(lit("p"), col("id")).as("path"),
        lit("insert").as("op"), (col("id") + seqBase).as("seq"),
        struct(lit("r").as("repo"), concat(lit("p"), col("id")).as("path"),
          lit("c").as("commit"), lit("scala").as("lang"),
          concat(lit("body"), col("id")).as("content"),
          concat(lit(xv), col("id")).as("x")).as("after"))
    }
    MergeApply.merge(src, batch(0 until 20, 0L, "xv"), Map.empty)
    ChainApply.sync(src, dst) // dst now holds x with VALUES

    src.evolveSchema(_.renameColumn("x", "y"))
    // only key p0 is re-delivered after the rename; every other row's y value
    // must still survive in dst THROUGH the rename (the divergence the
    // name-only catch-up caused: a fresh null 'y' column + a stale 'x')
    MergeApply.merge(src,
      batch(Seq(0), 100L, "xv").withColumn("after",
        col("after").withField("x", lit("renamed-then-updated"))), Map.empty)
    ChainApply.sync(src, dst)

    val dstCols = dst.refresh().schema.columns.map(_.name)
    assert(dstCols.contains("y") && !dstCols.contains("x"))
    def yVals(t: LakeTable) = t.read().select(col("path"), col("y"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(yVals(dst) === yVals(src))
    assert(yVals(dst)("p0") === "renamed-then-updated") // post-rename update landed
    assert(yVals(src).count(_._2 != null) === 20, "source must carry y values")
  }

  test("widen and rename landing in ONE sync window both propagate (no narrowing cast)") {
    import graft.ingest.MergeApply
    val src = LakeTable.create(spark, TestSpark.tmpDir("graft-chain-wr-src"), numBuckets = 4)
    val dst = LakeTable.create(spark, TestSpark.tmpDir("graft-chain-wr-dst"), numBuckets = 4)
    src.evolveSchema(_.addColumn("n", "int"))
    def batch(ids: Seq[Int], seqBase: Long, nv: org.apache.spark.sql.Column) = {
      import spark.implicits._
      ids.toDF("id").select(
        lit("r").as("repo"), concat(lit("p"), col("id")).as("path"),
        lit("insert").as("op"), (col("id") + seqBase).as("seq"),
        struct(lit("r").as("repo"), concat(lit("p"), col("id")).as("path"),
          lit("c").as("commit"), lit("scala").as("lang"),
          lit("body").as("content"), nv.as("n")).as("after"))
    }
    MergeApply.merge(src, batch(0 until 8, 0L, lit(7).cast("int")), Map.empty)
    ChainApply.sync(src, dst) // dst: n int
    // one window: widen n to long, rename n -> m, and deliver a value that
    // does not fit in int — a narrowing cast would mangle it
    src.evolveSchema(_.widenType("n", "long"))
    src.evolveSchema(_.renameColumn("n", "m"))
    val big = 5000000000L // > Int.MaxValue
    MergeApply.merge(src, batch(Seq(0), 100L, lit(big).cast("long")), Map.empty)
    ChainApply.sync(src, dst)
    val m = dst.refresh().schema.find("m").get
    assert(m.dataType === "long", s"dst column must be widened, got ${m.dataType}")
    val got = dst.read().filter(col("path") === "p0").select(col("m")).head().getLong(0)
    assert(got === big)
  }

  test("window composition: syncing after every source batch converges at arbitrary split points") {
    val c = cfg.copy(seed = 123L)
    val src = LakeTable.create(spark, TestSpark.tmpDir("graft-chain-comp-src"), numBuckets = 16)
    val dst = LakeTable.create(spark, TestSpark.tmpDir("graft-chain-comp-dst"), numBuckets = 16)
    val log = ChangelogGen.events(spark, c).toDF()
    // uneven, seeded split points — windows of very different sizes
    val rnd = new scala.util.Random(99)
    val cuts = (Seq(0L) ++ Seq.fill(5)(math.abs(rnd.nextLong()) % c.nEvents) :+ c.nEvents)
      .distinct.sorted
    cuts.sliding(2).foreach { case Seq(lo, hi) =>
      Ingest.replayLog(src, log.filter(col("seq") > lo && col("seq") <= hi))
      ChainApply.sync(src, dst)
      ()
    }
    assert(rows(dst) === rows(src))
    // per-row last-writer seq must ride through every window too
    def seqs(t: LakeTable) = t.readAllInternal().filter(!col("_deleted"))
      .select(col("repo"), col("path"), col("_seq"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(seqs(dst) === seqs(src))
  }

  test("chains compose: gold follows silver follows bronze") {
    val (src, silver, log, split) = freshPair(morSrc = false)
    val goldDir = TestSpark.tmpDir("graft-chain-gold")
    val gold = LakeTable.create(spark, goldDir, numBuckets = 16)
    ChainApply.sync(src, silver)
    ChainApply.sync(silver, gold)
    Ingest.replayLog(src, log.filter(col("seq") > split))
    ChainApply.sync(src, silver)
    ChainApply.sync(silver, gold)
    assert(rows(gold) === rows(src))
  }
}
