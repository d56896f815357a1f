package graft

import graft.ingest.Dedup
import graft.log.ChangeLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch scaling diagnostic: where does parallelism cap out? */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val logDir = args(0)
    val cores = args(1).toInt
    val aqe = args.length <= 2 || args(2).toBoolean
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] cores=$cores aqe=$aqe $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val log = ChangeLog.readDF(spark, logDir)
    println(s"[diag] scan tasks = ${log.rdd.getNumPartitions}")
    timed("scan+count")(log.count())
    timed("scan+count2")(log.count())
    timed("scan-wide-agg")(log.agg(sum(length(col("after.content")))).collect())
    val d = Dedup.lastWriterPerKey(log.filter(col("op") =!= "ddl"))
    timed("dedup-count")(d.count())
    timed("dedup-count2")(d.count())
    val dd = d.persist()
    timed("dedup-persist")(dd.count())
    spark.stop()
  }
}
