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
    // Each output task must hold a CONTIGUOUS (partition, offset) slice:
    // a hash repartition on (partition, segment) can collide two segments of
    // the same log partition into one task = one parquet file spanning
    // non-adjacent offset ranges, which breaks the disjoint-range contract
    // that mtime-ordered (offset-ordered) delivery — and with it
    // orderedDelivery fence filtering — relies on. Range partitioning makes
    // every file contiguous by construction.
    val maxOffsetRow = ds.toDF().agg(max(col("offset"))).collect()(0)
    if (maxOffsetRow.isNullAt(0)) {
      // empty changelog: still produce a valid (empty) log dir
      ds.toDF().write.mode("overwrite").partitionBy("partition").parquet(dir)
      return
    }
    val nPartitions = ds.toDF().agg(countDistinct(col("partition"))).collect()(0).getLong(0).toInt
    val nOut = math.max(1, nPartitions * segmentsPerPartition)
    ds.toDF()
      .repartitionByRange(nOut, col("partition"), col("offset"))
      .sortWithinPartitions(col("partition"), col("offset"))
      .write.mode("overwrite").partitionBy("partition").parquet(dir)
    stampMtimesByOffset(dir)
  }

  /** Encode each segment file's min offset into its mtime. Spark's file
    * stream source orders files by modification time, so this gives a
    * bulk-written log the same per-partition offset-ordered delivery that a
    * LIVE tail has naturally (the producer appends segments over real time).
    * Only with that contract may the ingest enable `orderedDelivery` fence
    * filtering; without it, LWW still converges (see IngestConfig).
    */
  def stampMtimesByOffset(dir: String): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val base = 1704067200000L // fixed epoch base, deterministic
    val files = scala.util.Using.resource(Files.walk(Paths.get(dir)))(
      _.iterator().asScala.filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq)
    files.foreach { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toUri), new org.apache.hadoop.conf.Configuration())
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val minOffset =
          try {
            reader.getFooter.getBlocks.asScala.flatMap { b =>
              b.getColumns.asScala
                .filter(_.getPath.toDotString == "offset")
                .map(_.getStatistics.genericGetMin.asInstanceOf[java.lang.Long].longValue())
            }.minOption.getOrElse(0L)
          } finally reader.close()
        Files.setLastModifiedTime(p, attribute.FileTime.fromMillis(base + minOffset))
      }
  }

  /** Batch read of the full log (replay). */
  def read(spark: SparkSession, dir: String): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.read.schema(Schemas.changeEvent).parquet(dir).as[ChangeEvent]
  }

  def readDF(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Schemas.changeEvent).parquet(dir)

  /** Streaming tail. File-stream sources require an explicit schema.
    * maxFileAge is disabled: segment mtimes ENCODE offsets (see
    * stampMtimesByOffset), so on a log spanning more than 7 days' worth of
    * offset-milliseconds the default age filter would silently ignore the
    * oldest segments. */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(Schemas.changeEvent)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("maxFileAge", "36500d")
      .parquet(dir)
}
