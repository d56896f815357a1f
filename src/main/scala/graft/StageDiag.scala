package graft

import graft.ingest.Ingest
import graft.lake.LakeTable
import graft.log.ChangeLog
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: per-stage task metrics for one replay, to localize scaling loss.
  * Prints wall-vs-cpu-vs-gc per stage. */
object StageDiag {
  def main(args: Array[String]): Unit = {
    val logDir = args(0)
    val cores = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo
        val m = s.taskMetrics
        val wall = (s.completionTime.getOrElse(0L) - s.submissionTime.getOrElse(0L)) / 1e3
        println(f"[stage] id=${s.stageId}%3d tasks=${s.numTasks}%4d wall=$wall%7.2fs " +
          f"run=${m.executorRunTime / 1e3}%8.2fs cpu=${m.executorCpuTime / 1e9}%8.2fs " +
          f"gc=${m.jvmGCTime / 1e3}%6.2fs deser=${m.executorDeserializeTime / 1e3}%5.2fs " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"out=${m.outputMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spillM=${m.memoryBytesSpilled / 1e6}%7.1fMB spillD=${m.diskBytesSpilled / 1e6}%7.1fMB peakMem=${m.peakExecutionMemory / 1e6}%7.1fMB [${s.name.take(30)}]")
      }
    }

    // warmup replay
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft-diag").toString
    def replay(): Unit = {
      val td = s"$work/t${System.nanoTime()}"
      LakeTable.create(spark, td, numBuckets = 64)
      Ingest.replayLog(LakeTable.load(spark, td), ChangeLog.readDF(spark, logDir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(td))
    }
    replay()
    println(s"[stage] ===== measured replay at local[$cores] =====")
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    replay()
    println(f"[stage] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
  }
}
