package graft

import graft.gen.ChangelogGen
import graft.ingest.Ingest
import graft.lake.LakeTable
import graft.log.ChangeLog
import graft.streaming.StreamIngest
import org.apache.spark.sql.SparkSession

/** Scratch CDC-only bench (not part of the driver contract): the CDC half of
  * [[Bench]] without the 27 operator queries, for fast iteration on the
  * ingest/fold hot path. Knobs via env:
  *   GRAFT_MOR_FOLD_EVERY       fold cadence in micro-batches (0 = final only)
  *   GRAFT_MOR_FOLD_MIN_EVENTS  partial-fold per-bucket threshold
  *   GRAFT_REPS                 timed repetitions per mode (default 2)
  *   GRAFT_SKIP_COW             skip the COW streaming mode
  */
object CdcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val foldEvery = sys.env.getOrElse("GRAFT_MOR_FOLD_EVERY", "0").toInt
    val foldMin = sys.env.getOrElse("GRAFT_MOR_FOLD_MIN_EVENTS", "0").toLong
    val reps = sys.env.getOrElse("GRAFT_REPS", "2").toInt
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val workRoot = if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      java.nio.file.Paths.get("/dev/shm") else java.nio.file.Paths.get("/tmp")
    val work = java.nio.file.Files.createTempDirectory(workRoot, "graft-cdcbench").toString
    val cfg = Bench.cdcGenConfig(sfDir, nPartitions = 16)
    val logDir = s"$work/log"
    ChangeLog.write(ChangelogGen.events(spark, cfg), logDir)

    if (sys.env.contains("GRAFT_PROF")) {
      spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val d = p.durationMs
          println(s"[cdc-prog] batch=${p.batchId} rows=${p.numInputRows} " +
            s"triggerMs=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
            s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
            s"queryPlanning=${d.get("queryPlanning")} walCommit=${d.get("walCommit")} " +
            s"commitOffsets=${d.get("commitOffsets")}")
        }
      })
    }
    val mft = sys.env.getOrElse("GRAFT_MAX_FILES_PER_TRIGGER", "16").toInt
    def runMor(morCfg: Ingest.IngestConfig): Double = {
      val tableDir = s"$work/table-${System.nanoTime()}"
      val ckptDir = s"$tableDir-ckpt"
      LakeTable.create(spark, tableDir, numBuckets = 64)
      val t0 = System.nanoTime()
      StreamIngest.runAvailable(spark, logDir, tableDir, ckptDir,
        maxFilesPerTrigger = mft, cfg = morCfg)
      val tStream = (System.nanoTime() - t0) / 1e9
      val fr = graft.ingest.Mor.fold(LakeTable.load(spark, tableDir))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cdc]   stream ${tStream}%6.2f s  finalFold ${sec - tStream}%6.2f s  (folded=${fr.deltaFilesFolded} files, ${fr.eventsFolded} events)")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptDir))
      sec
    }

    // warmup replay (JIT/codegen) then timed phases
    val w0 = Bench.runIngest(spark, logDir, work, streaming = false)
    println(f"[cdc] replay_cold   ${w0}%8.2f s")
    (1 to reps).foreach { i =>
      val s = Bench.runIngest(spark, logDir, work, streaming = false)
      println(f"[cdc] replay[$i]     ${s}%8.2f s  ${(cfg.nEvents / s).toLong} ev/s")
    }
    if (!sys.env.contains("GRAFT_SKIP_COW")) (1 to reps).foreach { i =>
      val s = Bench.runIngest(spark, logDir, work, streaming = true)
      println(f"[cdc] stream_cow[$i] ${s}%8.2f s  ${(cfg.nEvents / s).toLong} ev/s")
    }
    // interleaved A/B: final-fold-only vs in-stream partial-fold cadence
    val raw = sys.env.get("GRAFT_MOR_RAW").exists(v => v == "1" || v == "true")
    (1 to reps).foreach { i =>
      for ((fe, fm) <- Seq((0, 0L), (foldEvery, foldMin))) {
        val c = Ingest.IngestConfig(morMode = true, morFoldEvery = fe,
          morFoldMinEventsPerBucket = fm, morDedupPerBatch = !raw)
        val s = runMor(c)
        println(f"[cdc] stream_mor[$i,foldEvery=$fe,min=$fm,raw=$raw] ${s}%8.2f s  ${(cfg.nEvents / s).toLong} ev/s")
      }
    }
    // GRAFT_RULES=N: continuous multi-rule MOR tail with async cadence folds
    // (verdict r6 item #6) — N rules on one stream, each MOR + foldEvery=2,
    // catch up on the pre-written log then graceful-stop; throughput counts
    // applied events across rules
    sys.env.get("GRAFT_RULES").map(_.toInt).filter(_ > 0).foreach { nRules =>
      (1 to reps).foreach { i =>
        val dirs = (0 until nRules).map(r => s"$work/ruletab-$i-$r-${System.nanoTime()}")
        val ckpt = s"$work/rulesckpt-$i-${System.nanoTime()}"
        dirs.foreach(d => LakeTable.create(spark, d, numBuckets = 64))
        // fold knobs from the env (GRAFT_MOR_FOLD_*): the fixture has 64k
        // keys over 64 buckets (~1k winners/bucket/batch), so a production
        // threshold like 16384 correctly schedules NOTHING (zero-job ticks);
        // drop it to force cadence folds to actually fire in the datapoint
        val rules = dirs.zipWithIndex.map { case (d, r) =>
          StreamIngest.Rule(s"r$r", d, Ingest.IngestConfig(morMode = true,
            morFoldEvery = if (foldEvery > 0) foldEvery else 2,
            morFoldMinEventsPerBucket = foldMin)) }
        val expectedFence = ChangeLog.readDF(spark, logDir)
          .groupBy(org.apache.spark.sql.functions.col("partition"))
          .agg(org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.col("offset")))
          .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
        val t0 = System.nanoTime()
        @volatile var tailFailure: Throwable = null
        val tailThread = new Thread(() =>
          try StreamIngest.tailRules(spark, logDir, rules, ckpt, maxFilesPerTrigger = 4)
          catch { case e: Throwable => tailFailure = e })
        tailThread.start()
        // bounded wait: a dead tail (stale checkpoint, fold failure at a
        // batch boundary) must fail the bench, not wedge it forever
        val deadline = System.nanoTime() + 600L * 1000000000L
        while (dirs.exists(d => LakeTable.load(spark, d).snapshot.fence != expectedFence)) {
          if (tailFailure != null) throw tailFailure
          require(tailThread.isAlive, "tailRules thread died before catching up")
          require(System.nanoTime() < deadline, "tail_mor_rules catch-up timed out (600 s)")
          Thread.sleep(100)
        }
        val caughtUp = (System.nanoTime() - t0) / 1e9
        StreamIngest.requestStopRules(ckpt)
        tailThread.join(120000)
        val folds = dirs.map(d =>
          LakeTable.load(spark, d).snapshot.metrics.getOrElse("morFolds", 0L)).sum
        println(f"[cdc] tail_mor_rules[$i,n=$nRules] caught up ${caughtUp}%8.2f s  " +
          f"${(cfg.nEvents * nRules / caughtUp).toLong} applied-ev/s  (cadence folds ran: $folds)")
        dirs.foreach(d => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      }
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
  }
}
