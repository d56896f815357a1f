package graft

import graft.gen.{ChangelogGen, GenConfig, Oracle}
import graft.ingest.Ingest
import graft.lake.LakeTable
import graft.log.ChangeLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §7.3 first milestone, end-to-end:
  * seeded changelog → batch replay → LakeTable converges to the sequential
  * oracle (row count + per-row sha2(content,256) + per-row last-writer seq),
  * and a full second replay of the same log is a no-op (idempotence via the
  * offset fence + LWW).
  */
class ReplayConvergenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cfg = GenConfig(seed = 42L, nEvents = 20000L, nRepos = 50,
    pathsPerRepo = 20, skew = 3.0, nPartitions = 4, contentLen = 120)

  test("batch replay converges to the sequential-replay oracle (sha256 per row)") {
    val logDir = TestSpark.tmpDir("graft-log")
    val tableDir = TestSpark.tmpDir("graft-table")

    ChangelogGen.events(spark, cfg).transform(ds => { ChangeLog.write(ds, logDir); ds })
    val table = LakeTable.create(spark, tableDir, numBuckets = 16)
    val log = ChangeLog.readDF(spark, logDir)
    val bm = Ingest.replayLog(table, log)

    // oracle
    val oracle = Oracle.contentSha(Oracle.replay(ChangelogGen.eventsLocal(cfg)))

    val got = table.readAllInternal()
      .filter(!col("_deleted"))
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"), col("_seq"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getLong(3)))
      .toMap

    assert(got.size === oracle.size, "row count mismatch")
    oracle.foreach { case (k, (sha, seq)) =>
      assert(got.contains(k), s"missing key $k")
      assert(got(k)._1 === sha, s"content sha mismatch at $k")
      assert(got(k)._2 === seq, s"last-writer seq mismatch at $k")
    }

    // metrics sanity
    assert(bm.eventsSeen === cfg.nEvents)
    assert(bm.deadLetters === 0)
    val snap = table.snapshot
    assert(snap.fence.nonEmpty && snap.fence.values.max === cfg.nEvents - 1)

    // idempotence: replay the ENTIRE log again — nothing may change.
    val v1 = table.snapshot.version
    val sha1 = tableShaSet(table)
    Ingest.replayLog(table, log)
    assert(tableShaSet(table) === sha1, "second full replay changed the table")
    // everything was fenced out, so no rows were applied in the second pass
    val m2 = table.snapshot.metrics
    assert(m2("eventsApplied") === table.snapshotAt(v1).metrics("eventsApplied"))
  }

  private def tableShaSet(table: LakeTable): Set[(String, String, String, Long)] =
    table.readAllInternal()
      .filter(!col("_deleted"))
      .select(col("repo"), col("path"), sha2(col("content"), 256), col("_seq"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
}
