package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B harness for the headline MOR stream number (round-5
  * verdict item #1: BENCH_r05's stream_mor_events_per_sec moved the wrong way
  * vs BENCH_r04 and "window noise" is not a permanent answer). The SAME file
  * is compiled into both the r4 end-of-round worktree (e238655) and HEAD;
  * invocations of the two binaries alternate in one window, each JVM doing
  * 1 cold run (JIT/codegen/stream-engine warmup, discarded) + K timed runs of
  * that binary's own `Bench.runIngest(streaming = true, mor = true)` over a
  * SHARED pre-generated changelog. Session config mirrors Bench.main exactly.
  * Reported statistic: min over the timed runs per binary (host noise on this
  * shared VM is additive; method documented in BENCH/BASELINE.md).
  */
object MorAb {
  def main(args: Array[String]): Unit = {
    if (args(0) == "gen") { genLog(args(1)); return } // shared log, written once
    val logDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_SHUFFLE_CODEC", "zstd"))
      .config("spark.local.dir",
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm"))) "/dev/shm"
        else "/tmp")
      .config("spark.ui.enabled", "false")
      .appName("graft-morab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val workRoot = if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      java.nio.file.Paths.get("/dev/shm") else java.nio.file.Paths.get("/tmp")
    val work = java.nio.file.Files.createTempDirectory(workRoot, "graft-morab").toString
    try {
      val cold = Bench.runIngest(spark, logDir, work, streaming = true, mor = true)
      val secs = (1 to runs).map(_ =>
        Bench.runIngest(spark, logDir, work, streaming = true, mor = true))
      println(s"""MORAB {"cold":$cold,"runs":[${secs.mkString(",")}]}""")
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  /** Write the STANDARD Bench changelog (Bench.cdcGenConfig at sf0.1 —
    * 2M events, 16 partitions, 4 DDLs, skew 3.0) for both binaries to share. */
  private def genLog(logDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").appName("graft-morab-gen").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Bench.cdcGenConfig("/root/testdata/sf0.1", nPartitions = 16)
    graft.log.ChangeLog.write(graft.gen.ChangelogGen.events(spark, cfg), logDir)
    println(s"MORAB gen: ${cfg.nEvents} events -> $logDir")
    spark.stop()
  }
}
