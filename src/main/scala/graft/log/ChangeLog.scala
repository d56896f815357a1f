package graft.log

import graft.model.{ChangeEvent, Schemas}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Durable change-event log: the engine's replacement for the reference's
  * MySQL binlog tail (/root/reference/cobra/cobra.go:177-191).
  *
  * Layout: a directory of Parquet files hive-partitioned by log partition
  * (`partition=N/`), offsets monotonically increasing within a partition —
  * the (binlog_file, binlog_position) analog
  * (/root/reference/cobra/cobra.go:18-20). Written once by a producer (here:
  * the generator), then tailed by the engine either in batch
  * (replay-from-offset) or via Structured Streaming (file-stream source with
  * `maxFilesPerTrigger` emulating bounded micro-batches — the reference's
  * 100k-event handler buffer, /root/reference/config/configure.go:13).
  */
object ChangeLog {

  /** Write a changelog. `segmentsPerPartition` controls file granularity:
    * each (partition, offset-range) segment becomes one Parquet file, sorted
    * by offset, so a streaming tail sees roughly offset-ordered batches. */
  def write(ds: Dataset[ChangeEvent], dir: String, segmentsPerPartition: Int = 4): Unit = {
    import org.apache.spark.sql.functions._
    val nPart = ds.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    ds.toDF()
      .withColumn("_seg", (col("offset") % lit(segmentsPerPartition.toLong)).cast("int"))
      .repartition(nPart, col("partition"), col("_seg"))
      .sortWithinPartitions(col("partition"), col("offset"))
      .drop("_seg")
      .write.mode("overwrite").partitionBy("partition").parquet(dir)
  }

  /** Batch read of the full log (replay). */
  def read(spark: SparkSession, dir: String): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.read.schema(Schemas.changeEvent).parquet(dir).as[ChangeEvent]
  }

  def readDF(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Schemas.changeEvent).parquet(dir)

  /** Streaming tail. File-stream sources require an explicit schema. */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(Schemas.changeEvent)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
}
