package graft

import graft.gen.{ChangelogGen, GenConfig, Oracle}
import graft.ingest.Ingest
import graft.lake.LakeTable
import graft.log.ChangeLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-retry around DDL barriers: a foreachBatch retry re-delivers a batch
  * whose DDLs may ALREADY be applied (crash landed between the schema-only
  * commit and the final data commit). DDL application must be idempotent and
  * the retried batch must still converge.
  */
class DdlCrashRetrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("re-applying a batch whose DDLs already committed converges (idempotent DDL)") {
    import spark.implicits._
    val cfg = GenConfig(seed = 17L, nEvents = 3000L, nRepos = 10, pathsPerRepo = 8,
      nPartitions = 2, ddlEvery = 500L, contentLen = 50)
    val events = ChangelogGen.eventsLocal(cfg)
    val table = LakeTable.create(spark, TestSpark.tmpDir("graft-ddlretry"), numBuckets = 4)

    // first delivery: full batch incl. 6 DDLs
    val bm1 = Ingest.applyBatch(table, events.toDS().toDF(), batchId = 0)
    assert(bm1.ddlApplied === 6)
    val schemaId1 = table.schema.schemaId

    // simulate the worst retry: SAME batch again, but with a batchId the
    // table has NOT committed (as if the final commit was lost) — the DDLs
    // are already in the schema, rows already applied (LWW absorbs them)
    val bm2 = Ingest.applyBatch(table, events.toDS().toDF(), batchId = 1)
    assert(table.schema.schemaId === schemaId1, "idempotent DDL must not re-evolve")
    assert(bm2.eventsApplied === 0, "all re-delivered rows lose via LWW")

    // convergence: matches the oracle row-for-row
    val oracle = Oracle.contentSha(Oracle.replay(events))
      .map { case ((r, p), (sha, _)) => (r, p, sha) }.toSet
    val got = table.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === oracle)

    // evolved columns exist exactly once with their final shapes
    val names = table.schema.columns.map(_.name)
    assert(names.count(_ == "y0") === 1 && !names.contains("x0"))
  }

  test("compaction after schema evolution rewrites mixed-schema buckets under the current schema") {
    import spark.implicits._
    val cfg = GenConfig(seed = 19L, nEvents = 2000L, nRepos = 8, pathsPerRepo = 6,
      nPartitions = 2, ddlEvery = 700L, contentLen = 50)
    val events = ChangelogGen.eventsLocal(cfg)
    val table = LakeTable.create(spark, TestSpark.tmpDir("graft-ddlcomp"), numBuckets = 4)
    // two halves → files written under different schema versions
    Ingest.applyBatch(table, events.take(1000).toDS().toDF(), batchId = 0)
    Ingest.applyBatch(table, events.drop(1000).toDS().toDF(), batchId = 1)
    val mixed = table.snapshot.files.map(_.schemaId).toSet
    graft.lake.Maintenance.compact(table, force = true, tombstoneHorizon = Some(Long.MaxValue))
    val after = table.snapshot.files.map(_.schemaId).toSet
    assert(after === Set(table.schema.schemaId), s"compaction must unify schemas (was $mixed)")
    val oracle = Oracle.contentSha(Oracle.replay(events))
      .map { case ((r, p), (sha, _)) => (r, p, sha) }.toSet
    val got = table.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === oracle)
  }
}
