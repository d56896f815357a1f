package graft

import graft.gen.{ChangelogGen, GenConfig, Oracle}
import graft.ingest.Ingest
import graft.lake.LakeTable
import graft.log.ChangeLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-stream schema evolution (north rule): add/widen/rename DDL mid-stream,
  * applied as batch barriers; old files stay readable under the evolved
  * schema via ID-based column mapping + Catalyst-safe casts; row convergence
  * (sha256) is unaffected.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("DDL mid-stream evolves the schema; rows still converge to the oracle") {
    val cfg = GenConfig(seed = 7L, nEvents = 6000L, nRepos = 20, pathsPerRepo = 10,
      nPartitions = 4, ddlEvery = 1000L, contentLen = 80)
    val logDir = TestSpark.tmpDir("graft-evo-log")
    val tableDir = TestSpark.tmpDir("graft-evo-table")
    ChangeLog.write(ChangelogGen.events(spark, cfg), logDir)
    val table = LakeTable.create(spark, tableDir, numBuckets = 8)
    val bm = Ingest.replayLog(table, ChangeLog.readDF(spark, logDir))

    // 6000 events, one DDL per 1000 → 6 DDLs: add x0(int), widen x0→long,
    // rename x0→y0, add x1(int), widen x1→long, rename x1→y1
    assert(bm.ddlApplied === 6)
    val sch = table.schema
    assert(sch.find("y0").exists(_.dataType == "long"))
    assert(sch.find("y1").exists(_.dataType == "long"))
    assert(sch.find("x0").isEmpty && sch.find("x1").isEmpty)

    // oracle agreement on rows (extra columns all-null — events never carry them)
    val oracle = Oracle.contentSha(Oracle.replay(ChangelogGen.eventsLocal(cfg)))
    val got = table.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"),
        col("y0"), col("y1"))
      .collect()
    assert(got.length === oracle.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(oracle(k)._1 === r.getString(2), s"sha mismatch at $k")
      assert(r.isNullAt(3) && r.isNullAt(4), s"extra columns must be null at $k")
    }

    // old-schema files are mapped by column id: reading never throws and the
    // evolved columns are typed long
    val types = table.read().schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("y0") === "long" && types("y1") === "long")
  }

  test("update events preserve columns not carried by the after-image") {
    import graft.ingest.{Dedup, MergeApply}
    val tableDir = TestSpark.tmpDir("graft-evo2-table")
    val table = LakeTable.create(spark, tableDir, numBuckets = 4)
    table.evolveSchema(_.addColumn("stars", "int"))

    // seed a row that HAS a stars value (simulating an out-of-band backfill
    // writing wide rows: delta carries all 6 columns via a wide after struct)
    val wide = spark.createDataFrame(Seq(
      ("r1", "p1", "c0", "scala", "v0", 5)
    )).toDF("repo", "path", "commit", "lang", "content", "stars")
      .select(col("repo"), col("path"), lit("insert").as("op"), lit(1L).as("seq"),
        struct(col("repo"), col("path"), col("commit"), col("lang"),
          col("content"), col("stars")).as("after"))
    MergeApply.merge(table, wide, Map.empty)
    assert(table.read().select("stars").collect()(0).getInt(0) === 5)

    // a normal (5-column-image) update must NOT clobber stars
    val upd = spark.createDataFrame(Seq(("r1", "p1", "c1", "scala", "v1")))
      .toDF("repo", "path", "commit", "lang", "content")
      .select(col("repo"), col("path"), lit("update").as("op"), lit(2L).as("seq"),
        struct(col("repo"), col("path"), col("commit"), col("lang"), col("content")).as("after"))
    MergeApply.merge(table, upd, Map.empty)
    val r = table.read().select("content", "stars").collect()(0)
    assert(r.getString(0) === "v1", "update must apply the after-image")
    assert(r.getInt(1) === 5, "update must preserve columns absent from the image " +
      "(reference: UPDATE SET only carried fields, event/sql_maker.go:161-177)")

    // widen the populated int column to long: OLD files (written as int) must
    // read back as long through the ID-based mapping + Catalyst cast
    table.evolveSchema(_.widenType("stars", "long"))
    val widened = table.read().select("stars").collect()(0)
    assert(widened.getLong(0) === 5L, "int data must read as long post-widen")
    assert(table.read().schema("stars").dataType.typeName === "long")

    // delete tombstones everything
    val del = spark.createDataFrame(Seq(("r1", "p1")))
      .toDF("repo", "path")
      .select(col("repo"), col("path"), lit("delete").as("op"), lit(3L).as("seq"),
        lit(null).cast(graft.model.Schemas.repoRow).as("after"))
    MergeApply.merge(table, del, Map.empty)
    assert(table.read().count() === 0)
  }
}
