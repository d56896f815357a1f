package graft

import graft.gen.{ChangelogGen, GenConfig}
import graft.ingest.Ingest
import graft.lake.LakeTable
import graft.log.ChangeLog
import graft.streaming.StreamIngest
import org.apache.spark.sql.SparkSession

/** Per-round benchmark (driver-run): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, then runs the CDC headline — replay a deterministic
  * changelog (sized by the sf dir) end-to-end into a fresh LakeTable — and
  * reports change-events/sec applied, the north-rule metric.
  *
  * Prints ONE JSON line. Scaling-efficiency evidence (local[8] vs local[32])
  * is produced by [[ScalingBench]] and recorded in BENCH/BASELINE.md.
  */
object Bench {

  def cdcEventsFor(sfDir: String): Long = {
    // sf0.001 → 20k, sf0.01 → 200k, sf0.1 → 2M  (nominal 10^10 at sf=500)
    val sf = raw"sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.01)
    math.max(20000L, (20000000L * sf).toLong)
  }

  def cdcGenConfig(sfDir: String, nPartitions: Int): GenConfig = {
    val n = cdcEventsFor(sfDir)
    GenConfig(seed = 42L, nEvents = n,
      nRepos = math.max(64, (n / 2000L).toInt),
      pathsPerRepo = 64, skew = 3.0,
      nPartitions = nPartitions, ddlEvery = 0L, contentLen = 160)
  }

  /** Run the CDC ingest over a pre-written changelog; returns elapsed sec. */
  def runIngest(spark: SparkSession, logDir: String, workDir: String, streaming: Boolean): Double = {
    val tableDir = s"$workDir/table-${System.nanoTime()}"
    val ckptDir = s"$tableDir-ckpt"
    LakeTable.create(spark, tableDir, numBuckets = 64)
    val t0 = System.nanoTime()
    if (streaming) {
      StreamIngest.runAvailable(spark, logDir, tableDir, ckptDir, maxFilesPerTrigger = 16)
    } else {
      val table = LakeTable.load(spark, tableDir)
      Ingest.replayLog(table, ChangeLog.readDF(spark, logDir))
    }
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. operator queries
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // 2. CDC headline: changelog replay → converged LakeTable
    val work = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val cfg = cdcGenConfig(sfDir, nPartitions = 16)
    val logDir = s"$work/log"
    ChangeLog.write(ChangelogGen.events(spark, cfg), logDir)
    val batchColdSec = runIngest(spark, logDir, work, streaming = false) // JIT/codegen warmup
    val batchSec = runIngest(spark, logDir, work, streaming = false)
    val streamSec = runIngest(spark, logDir, work, streaming = true)
    val evps = cfg.nEvents / batchSec
    val evpsStream = cfg.nEvents / streamSec

    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + batchSec + streamSec
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""cdc":{"events":${cfg.nEvents},"replay_sec":$batchSec,"replay_cold_sec":$batchColdSec,""" +
      s""""events_per_sec":${evps.toLong},""" +
      s""""stream_sec":$streamSec,"stream_events_per_sec":${evpsStream.toLong},"cores":$cpus}}""")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
  }
}

/** North-rule scaling evidence: the SAME ingest job on the SAME changelog at
  * two parallelism levels (local[8] vs local[32] — no real cluster in this
  * sandbox), reporting both throughputs and the scaling efficiency
  * (tp32/tp8)/(32/8). Writes/updates BENCH/BASELINE.md.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // The scaling run must be CPU-bound to say anything about scaling: at the
    // default bench size the job finishes in seconds and fixed costs dominate
    // (Amdahl). 8× the bench size keeps local[8] in the minutes range.
    val nEventsOverride = if (args.length > 1) Some(args(1).toLong) else None
    val coresA = 8
    val coresB = 32
    val work = java.nio.file.Files.createTempDirectory("graft-scale").toString
    val logDir = s"$work/log"

    def session(cores: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // generate once (at full parallelism) — input identical for both runs
    val base = Bench.cdcGenConfig(sfDir, nPartitions = 32)
    val cfg = nEventsOverride match {
      case Some(n) => base.copy(nEvents = n, nRepos = math.max(64, (n / 2000L).toInt))
      case None => base.copy(nEvents = base.nEvents * 8, nRepos = base.nRepos * 8)
    }
    locally {
      val s = session(coresB)
      ChangeLog.write(ChangelogGen.events(s, cfg), logDir)
      s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    def measure(cores: Int): Double = {
      val s = session(cores)
      Bench.runIngest(s, logDir, work, streaming = false) // JIT/codegen warmup
      val sec = Bench.runIngest(s, logDir, work, streaming = false)
      s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      sec
    }

    val secA = measure(coresA)
    val secB = measure(coresB)
    val tpA = cfg.nEvents / secA
    val tpB = cfg.nEvents / secB
    val eff = (tpB / tpA) / (coresB.toDouble / coresA)
    val line =
      f"""{"events":${cfg.nEvents},"cores_a":$coresA,"sec_a":$secA%.2f,"tp_a":${tpA.toLong},"cores_b":$coresB,"sec_b":$secB%.2f,"tp_b":${tpB.toLong},"scaling_efficiency":$eff%.3f}"""
    println(line)

    val md =
      f"""
         |## Scaling run (${java.time.Instant.now()})
         |
         || events | local[$coresA] sec | local[$coresA] ev/s | local[$coresB] sec | local[$coresB] ev/s | efficiency (≥0.8 target) |
         ||---|---|---|---|---|---|
         || ${cfg.nEvents} | $secA%.2f | ${tpA.toLong} | $secB%.2f | ${tpB.toLong} | $eff%.3f |
         |""".stripMargin
    val p = java.nio.file.Paths.get("BENCH")
    java.nio.file.Files.createDirectories(p)
    val f = p.resolve("BASELINE.md")
    val prev = if (java.nio.file.Files.exists(f)) java.nio.file.Files.readString(f) else
      "# BENCH/BASELINE.md — scaling-efficiency evidence (north rule: ≥0.8 between N and 4N)\n"
    java.nio.file.Files.writeString(f, prev + md)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
  }
}
