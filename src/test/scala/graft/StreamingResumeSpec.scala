package graft

import graft.gen.{ChangelogGen, GenConfig, Oracle}
import graft.ingest.Ingest
import graft.lake.LakeTable
import graft.log.ChangeLog
import graft.streaming.StreamIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Replay/resume contracts (north rule): kill the stream mid-run, restart
  * from the SAME checkpoint → reconverges; restart from a FRESH checkpoint
  * (full source replay) → the offset fence makes re-delivery a no-op; final
  * state equals the oracle row-by-row (sha256).
  */
class StreamingResumeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cfg = GenConfig(seed = 11L, nEvents = 12000L, nRepos = 30,
    pathsPerRepo = 12, nPartitions = 4, contentLen = 80)

  private def shaSet(table: LakeTable): Set[(String, String, String)] =
    table.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("kill mid-stream, resume from checkpoint, then fresh-checkpoint replay — all converge") {
    val logDir = TestSpark.tmpDir("graft-resume-log")
    val tableDir = TestSpark.tmpDir("graft-resume-table")
    val ckptDir = TestSpark.tmpDir("graft-resume-ckpt")
    ChangeLog.write(ChangelogGen.events(spark, cfg), logDir, segmentsPerPartition = 6)
    LakeTable.create(spark, tableDir, numBuckets = 8)

    // 1. a stream that CRASHES on its third micro-batch
    val failing = ChangeLog.readStream(spark, logDir, maxFilesPerTrigger = 4)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == 2) throw new RuntimeException("injected crash")
        val t = LakeTable.load(spark, tableDir)
        Ingest.applyBatch(t, batch, batchId)
        ()
      }
      .start()
    val crashed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      failing.awaitTermination()
    }
    assert(crashed.getMessage.contains("injected crash") ||
      crashed.getCause.getMessage.contains("injected crash"))

    // 2. resume from the SAME checkpoint: batch 2 is re-delivered and applied
    StreamIngest.runAvailable(spark, logDir, tableDir, ckptDir, maxFilesPerTrigger = 4)
    val oracle = Oracle.contentSha(Oracle.replay(ChangelogGen.eventsLocal(cfg)))
      .map { case ((r, p), (sha, _)) => (r, p, sha) }.toSet
    val table = LakeTable.load(spark, tableDir)
    assert(shaSet(table) === oracle, "resume-from-checkpoint must reconverge")

    // 3. 'rebase'-style fresh checkpoint: the ENTIRE log is re-delivered;
    //    the offset fence must absorb it without a single reapplied event
    val applied1 = table.snapshot.metrics("eventsApplied")
    StreamIngest.runAvailable(spark, logDir, tableDir,
      TestSpark.tmpDir("graft-resume-ckpt2"), maxFilesPerTrigger = 8)
    table.refresh()
    assert(shaSet(table) === oracle, "fresh-checkpoint replay must be a no-op")
    assert(table.snapshot.metrics("eventsApplied") === applied1,
      "fence must skip every re-delivered event")
  }

  test("graceful stop (marker) ends a continuous tail; resume from the same checkpoint loses nothing") {
    val logDir = TestSpark.tmpDir("graft-stop-log")
    val tableDir = TestSpark.tmpDir("graft-stop-table")
    val ckptDir = TestSpark.tmpDir("graft-stop-ckpt")
    val small = cfg.copy(nEvents = 8000L)
    ChangeLog.write(ChangelogGen.events(spark, small), logDir, segmentsPerPartition = 6)
    LakeTable.create(spark, tableDir, numBuckets = 8)

    val tailThread = new Thread(() =>
      StreamIngest.tail(spark, logDir, tableDir, ckptDir, maxFilesPerTrigger = 2))
    tailThread.start()
    // wait for at least one committed batch, then request a graceful stop
    val deadline = System.currentTimeMillis() + 120000
    while (LakeTable.load(spark, tableDir).snapshot.version < 1 &&
      System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(LakeTable.load(spark, tableDir).snapshot.version >= 1, "no batch committed in time")
    StreamIngest.requestStop(tableDir)
    tailThread.join(120000)
    assert(!tailThread.isAlive, "tail must terminate after the stop request")

    // run-report listener left progress evidence
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(tableDir, "_progress", "progress.jsonl")))

    // resume from the SAME checkpoint to completion → exact oracle state
    StreamIngest.runAvailable(spark, logDir, tableDir, ckptDir, maxFilesPerTrigger = 8)
    val oracle = Oracle.contentSha(Oracle.replay(ChangelogGen.eventsLocal(small)))
      .map { case ((r, p), (sha, _)) => (r, p, sha) }.toSet
    assert(shaSet(LakeTable.load(spark, tableDir)) === oracle,
      "stop → resume must lose nothing")
  }

  test("foreachBatch retry of a committed batchId is an exact no-op") {
    val logDir = TestSpark.tmpDir("graft-retry-log")
    val tableDir = TestSpark.tmpDir("graft-retry-table")
    val small = cfg.copy(nEvents = 2000L)
    ChangeLog.write(ChangelogGen.events(spark, small), logDir)
    val table = LakeTable.create(spark, tableDir, numBuckets = 8)
    val log = ChangeLog.readDF(spark, logDir)
    val bm1 = Ingest.applyBatch(table, log, batchId = 0)
    assert(bm1.eventsApplied > 0)
    val v1 = table.snapshot.version
    // simulate the streaming engine re-invoking foreachBatch with the same id
    val bm2 = Ingest.applyBatch(table, log, batchId = 0)
    assert(bm2.eventsApplied === 0 && table.snapshot.version === v1)
  }
}
