package graft

import graft.gen.ChangelogGen
import graft.ingest.{Dedup, Ingest, MergeApply}
import graft.lake.LakeTable
import graft.log.ChangeLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the ingest pipeline (not part of the driver
  * contract). */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val work = java.nio.file.Files.createTempDirectory("graft-prof").toString
    val cfg0 = Bench.cdcGenConfig(args.headOption.getOrElse("/root/testdata/sf0.01"), nPartitions = 16)
    val cfg = sys.env.get("GRAFT_EVENTS") match {
      case Some(n) => cfg0.copy(nEvents = n.toLong, nRepos = math.max(64, (n.toLong / 2000L).toInt))
      case None => cfg0
    }
    val logDir = s"$work/log"
    timed("gen+write")(ChangeLog.write(ChangelogGen.events(spark, cfg), logDir))

    if (sys.env.contains("GRAFT_EXPLAIN")) {
      val log0 = ChangeLog.readDF(spark, logDir)
      val err = graft.ingest.Validate.errorExpr
      val st = log0.groupBy(col("partition")).agg(
        count(lit(1)), max(col("offset")),
        sum(when(err.isNotNull, 1L).otherwise(0L)),
        sum(when(err.isNull && col("op").isin("insert","update","delete"), 1L).otherwise(0L)))
      st.explain("formatted")
      spark.stop(); sys.exit(0)
    }

    val tableDir = s"$work/table"
    LakeTable.create(spark, tableDir, numBuckets = 64)
    val table = LakeTable.load(spark, tableDir)
    val log = ChangeLog.readDF(spark, logDir)

    val cached = log
    timed("stats-agg") {
      cached.groupBy(col("partition")).agg(
        count(lit(1)), max(col("offset")),
        sum(when(graft.ingest.Validate.errorExpr.isNull, 1L).otherwise(0L))).collect()
    }
    val deduped = timed("dedup+persist+count") {
      val d = Dedup.lastWriterPerKey(cached.filter(col("op") =!= "ddl")).persist()
      println(s"[prof]   delta keys = ${d.count()}")
      d
    }
    timed("merge-full") {
      MergeApply.merge(table, deduped, Map(0 -> 999999999L))
    }
    timed("second-replay-full-pipeline") {
      val t2dir = s"$work/table2"
      LakeTable.create(spark, t2dir, numBuckets = 64)
      Ingest.replayLog(LakeTable.load(spark, t2dir), log)
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
  }
}
