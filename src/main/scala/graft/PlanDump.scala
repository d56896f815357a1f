package graft

import graft.gen.{ChangelogGen, GenConfig}
import graft.ingest.Dedup
import graft.lake.LakeTable
import graft.log.ChangeLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: dump formatted plans of the hot paths for plan-quality review. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-plan").toString
    val cfg = GenConfig(nEvents = 5000, nRepos = 20, pathsPerRepo = 10, nPartitions = 2)
    ChangeLog.write(ChangelogGen.events(spark, cfg), s"$work/log")
    val table = LakeTable.create(spark, s"$work/table", numBuckets = 8)
    graft.ingest.Ingest.replayLog(table, ChangeLog.readDF(spark, s"$work/log"))

    val log = ChangeLog.readDF(spark, s"$work/log")
    println("=== DEDUP (last writer per key) ===")
    Dedup.lastWriterPerKey(log.filter(col("op") =!= "ddl")).explain("formatted")

    println("=== PUBLIC READ (tombstone filter + projection pushdown) ===")
    table.read().select("repo", "path").filter(col("repo") === "org/project-00003")
      .explain("formatted")

    println("=== SOURCE-SIDE FILTER (repo regex + op pushdown) ===")
    log.filter(graft.ingest.FilterChain.opFilter(Seq("insert")) &&
      col("repo").startsWith("org/project-0000")).select("repo", "path", "seq")
      .explain("formatted")

    println("=== SPARKENTRY cdc_merge_fold ===")
    SparkEntry.queries("cdc_merge_fold")(spark, "/root/testdata/sf0.001").explain("formatted")

    // merge strategy plans (set GRAFT_EXPLAIN to print them from inside merge)
    import graft.ingest.MergeApply
    def delta(ids: Seq[Long], seq: Long) = {
      import spark.implicits._
      ids.toDF("id").select(
        concat(lit("repo-"), col("id") % 10).as("repo"),
        concat(lit("f"), col("id")).as("path"),
        lit("update").as("op"), lit(seq).as("seq"),
        struct(concat(lit("repo-"), col("id") % 10).as("repo"),
          concat(lit("f"), col("id")).as("path"),
          lit("c").as("commit"), lit("scala").as("lang"),
          lit("x").as("content")).as("after"))
    }
    val t2 = LakeTable.create(spark, s"$work/t2", numBuckets = 8, targetFileRows = 500L)
    println("=== MERGE strategy 1: insert-only (no join) ===")
    MergeApply.merge(t2, delta(0L until 5000L, 1L), Map.empty)
    println("=== MERGE strategy 2: broadcast-incremental (base must show NO Exchange) ===")
    MergeApply.merge(t2, delta(Seq(17L, 23L, 99L), 10L), Map.empty)
    println("=== MERGE strategy 3: bucket-aligned shuffle (ONE Exchange per side, none after join) ===")
    MergeApply.merge(t2, delta(0L until 4000L, 20L), Map.empty,
      selection = Some(MergeApply.selectFiles(t2, delta(0L until 4000L, 20L))
        .copy(deltaRowsHint = 4000000L))) // force the shuffle path

    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
  }
}
