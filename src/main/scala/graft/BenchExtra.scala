package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-7 optimization harness (guide §1: measure first) — SEPARATE from the
  * frozen [[Bench]]:
  *
  *  - `plans <tag>`: dump `.explain("formatted")` of every SparkEntry query to
  *    `plans/r07/<query>_<tag>.txt` (the judge-checkable plan evidence).
  *  - `micro <repeats> [query...]`: time chosen queries (all when omitted)
  *    `repeats` times each under the same session conf as Bench, reporting
  *    min/median — plus a per-JOB trace (job description → seconds) so the
  *    composite store-backed queries show where their time goes.
  *
  * Measurement methodology matches Bench (`.count()` action, warmup of the
  * parquet readers + the two codegen-heavy queries) so numbers are comparable;
  * this main adds nothing to the frozen harness and is never run by the driver.
  */
object BenchExtra {

  final class JobTrace extends SparkListener {
    val rows = new scala.collection.mutable.ArrayBuffer[(Int, String, Long)]
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val desc = Option(js.properties.getProperty("spark.job.description")).getOrElse("")
      starts.put(js.jobId, (desc, js.time))
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val s = starts.remove(je.jobId)
      if (s != null) rows.synchronized { rows += ((je.jobId, s._1, je.time - s._2)) }
    }
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      if (sys.env.contains("GRAFT_TRACE_STAGES")) {
        val si = sc.stageInfo; val m = si.taskMetrics
        println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%8.1f s " +
          f"cpu=${m.executorCpuTime / 1e9}%9.1f s run=${m.executorRunTime / 1e3}%9.1f s " +
          f"in=${m.inputMetrics.recordsRead}%12d sh_r=${m.shuffleReadMetrics.recordsRead}%12d " +
          f"sh_w=${m.shuffleWriteMetrics.recordsWritten}%12d " +
          f"spillMB=${m.diskBytesSpilled / 1048576}%6d  ${si.name.take(40)}")
      }
    def drain(): Seq[(Int, String, Long)] = rows.synchronized {
      val r = rows.toSeq; rows.clear(); r
    }
  }

  def session(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.files.maxPartitionBytes", "33554432")
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    .config("spark.io.compression.codec", sys.env.getOrElse("GRAFT_SHUFFLE_CODEC", "zstd"))
    .config("spark.local.dir",
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm"))) "/dev/shm"
      else "/tmp")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    Seq("events", "documents", "embeddings", "nation").foreach { tbl =>
      try spark.read.parquet(s"$sfDir/$tbl.parquet").count() catch { case _: Throwable => }
    }
    try SparkEntry.queries("ann_cosine_topk")(spark, sfDir).count() catch { case _: Throwable => }
    try SparkEntry.queries("ann_ivf_topk")(spark, sfDir).count() catch { case _: Throwable => }
    try SparkEntry.twoPhaseTableCached(spark, sfDir) catch { case _: Throwable => }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = if (args.nonEmpty) args(0) else "micro"
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "plans" =>
        val tag = if (args.length > 1) args(1) else "before"
        val outDir = java.nio.file.Paths.get("plans/r07")
        java.nio.file.Files.createDirectories(outDir)
        warmup(spark, sfDir)
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
            println(s"[plans] $name -> ${name}_$tag.txt (${plan.length} chars)")
          } catch { case e: Throwable => println(s"[plans] $name FAILED: $e") }
        }

      case "micro" =>
        val repeats = if (args.length > 1) args(1).toInt else 3
        val wanted = if (args.length > 2) args.drop(2).toSeq
                     else SparkEntry.queries.keys.toSeq.sorted
        val trace = new JobTrace
        spark.sparkContext.addSparkListener(trace)
        warmup(spark, sfDir)
        Thread.sleep(200); trace.drain()
        val results = wanted.map { name =>
          val fn = SparkEntry.queries(name)
          val times = (1 to repeats).map { i =>
            spark.sparkContext.setJobDescription(s"$name#$i")
            val t0 = System.nanoTime()
            val ok = try { fn(spark, sfDir).count(); true }
              catch { case e: Throwable => println(s"$name ERR $e"); false }
            // a failed run must read as +inf, never as a fast time
            val sec = if (ok) (System.nanoTime() - t0) / 1e9 else Double.PositiveInfinity
            spark.sparkContext.setJobDescription(null)
            Thread.sleep(100)
            val jobs = trace.drain()
            if (sys.env.contains("GRAFT_TRACE_JOBS") && i == repeats)
              jobs.foreach { case (id, d, ms) => println(f"    job $id%4d ${ms / 1e3}%7.3f s  $d") }
            sec
          }.sorted
          val med = times(times.length / 2)
          println(f"[micro] $name%-25s min=${times.head}%7.3f med=$med%7.3f max=${times.last}%7.3f")
          name -> (times.head, med)
        }
        println(f"[micro] TOTAL min=${results.map(_._2._1).sum}%.3f med=${results.map(_._2._2).sum}%.3f")

      case "inner" =>
        // the store-backed queries materialize (localCheckpoint) before
        // returning, so their outer plan is a checkpoint scan; dump the
        // interesting INNER plans by driving the operators directly
        import org.apache.spark.sql.functions._
        val tag = if (args.length > 1) args(1) else "before"
        val outDir = java.nio.file.Paths.get("plans/r07")
        java.nio.file.Files.createDirectories(outDir)
        def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
          java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"),
            df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
          println(s"[inner] $name")
        }
        locally {
          import graft.operators.IvfIndex
          val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          val idx = SparkEntry.scratchDir("graft-planivf")
          try {
            IvfIndex.build(idx, e, col("vec_id"), col("embedding"), SparkEntry.IvfCfg)
            dump("ann_ivf_topk_inner", IvfIndex.topK(spark, idx,
              e.filter(col("vec_id") < 8), col("vec_id"), col("embedding"), nProbe = 2, k = 3))
          } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
        }
        locally {
          import graft.operators.SigStore
          val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          val store = SparkEntry.scratchDir("graft-plansig")
          try {
            val cfg = SparkEntry.SigStoreCfg
            SigStore.appendUpserts(store, docs.filter(col("doc_id") % 10 =!= 0),
              col("doc_id"), col("text"), lit(1L), cfg)
            val batch = docs.filter(col("doc_id") % 10 === 0)
            dump("dedup_incremental_inner",
              SigStore.incrementalPairsPlan(spark, store, batch,
                col("doc_id"), col("text"), cfg, minEst = 0.25))
          } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
        }

      case "simplan" =>
        import org.apache.spark.sql.functions._
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val df = graft.functions.TextDedup.simHashPairsPlan(docs, "doc_id", "text",
          shingleLen = 3, maxHamming = 6)
        val outDir = java.nio.file.Paths.get("plans/r07")
        java.nio.file.Files.createDirectories(outDir)
        val tag = if (args.length > 1) args(1) else "inner"
        java.nio.file.Files.writeString(outDir.resolve(s"dedup_simhash_${tag}.txt"),
          df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
        println("[simplan] dumped")

      case "splits" =>
        val reps = if (args.length > 1) args(1).toInt else 3
        val strace2 = new JobTrace
        if (sys.env.contains("GRAFT_TRACE_JOBS")) spark.sparkContext.addSparkListener(strace2)
        warmup(spark, sfDir)
        val all = (1 to reps).map { i =>
          strace2.drain()
          val r = Bench.storeSplits(spark, sfDir).toMap
          Thread.sleep(100)
          if (sys.env.contains("GRAFT_TRACE_JOBS") && i == reps)
            strace2.drain().foreach { case (id, d, ms) =>
              println(f"[splits]    job $id%4d ${ms / 1e3}%7.3f s  ${d.take(70)}") }
          r
        }
        all.head.keys.toSeq.sorted.foreach { k =>
          val vs = all.map(_(k)).sorted
          println(f"[splits] $k%-22s min=${vs.head}%7.3f med=${vs(vs.length / 2)}%7.3f")
        }

      case "sigprobe" =>
        import org.apache.spark.sql.functions._
        import graft.functions.TextDedup
        val strace = new JobTrace
        spark.sparkContext.addSparkListener(strace)
        warmup(spark, sfDir)
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .filter(col("doc_id") % 10 =!= 0)
        def timed(label: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
          strace.drain()
          val t0 = System.nanoTime(); f
          println(f"[sigprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
          Thread.sleep(100)
          if (i == 3) strace.drain().foreach { case (id, d, ms) =>
            println(f"[sigprobe]    job $id%4d ${ms / 1e3}%7.3f s  ${d.take(60)}") }
        }
        val cfg = SparkEntry.SigStoreCfg
        timed("minhash-sig-noop") {
          docs.select(col("doc_id").cast("string").as("doc"),
            TextDedup.minHashSignatureFromHashes(
              TextDedup.shingleHashes(col("text"), cfg.shingleLen), cfg.k).as("sig"))
            .write.format("noop").mode("overwrite").save()
        }
        timed("banded-explode-noop") {
          val r = docs.select(col("doc_id").cast("string").as("doc"),
            TextDedup.minHashSignatureFromHashes(
              TextDedup.shingleHashes(col("text"), cfg.shingleLen), cfg.k).as("sig"))
            .select(col("doc"), col("sig"),
              explode(org.apache.spark.sql.functions.transform(
                sequence(lit(0), lit(cfg.bands - 1)),
                b => concat_ws("|", b.cast("string"), concat_ws(",",
                  org.apache.spark.sql.functions.transform(
                    slice(col("sig"), b * cfg.rowsPerBand + 1, lit(cfg.rowsPerBand)),
                    x => x.cast("string")))))).as("bucket"))
          r.write.format("noop").mode("overwrite").save()
        }
        timed("full-append") {
          val store = SparkEntry.scratchDir("graft-sigprobe")
          try graft.operators.SigStore.appendUpserts(store, docs,
            col("doc_id"), col("text"), lit(1L), cfg)
          finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
        }

      case "cdc" =>
        // CDC-leg isolation with the same generator/config as the frozen
        // bench (replay warm/cold, COW stream, MOR stream ×2); set
        // GRAFT_BENCH_SPLIT=1 to get Bench.runIngest's stream/fold split and
        // GRAFT_TRACE_JOBS=1 for per-job traces of the LAST MOR run
        import graft.gen.ChangelogGen
        import graft.log.ChangeLog
        val ctrace = new JobTrace
        if (sys.env.contains("GRAFT_TRACE_JOBS")) spark.sparkContext.addSparkListener(ctrace)
        val workRoot = if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
          java.nio.file.Paths.get("/dev/shm") else java.nio.file.Paths.get("/tmp")
        val work = java.nio.file.Files.createTempDirectory(workRoot, "graft-cdcx").toString
        val cfg = Bench.cdcGenConfig(sfDir, nPartitions = 16)
        val logDir = s"$work/log"
        ChangeLog.write(ChangelogGen.events(spark, cfg), logDir)
        println(f"[cdc] replay_cold  ${Bench.runIngest(spark, logDir, work, streaming = false)}%7.2f s")
        println(f"[cdc] replay_warm  ${Bench.runIngest(spark, logDir, work, streaming = false)}%7.2f s")
        println(f"[cdc] stream_cow   ${Bench.runIngest(spark, logDir, work, streaming = true)}%7.2f s")
        println(f"[cdc] stream_mor1  ${Bench.runIngest(spark, logDir, work, streaming = true, mor = true)}%7.2f s")
        ctrace.drain()
        println(f"[cdc] stream_mor2  ${Bench.runIngest(spark, logDir, work, streaming = true, mor = true)}%7.2f s")
        Thread.sleep(200)
        if (sys.env.contains("GRAFT_TRACE_JOBS"))
          ctrace.drain().foreach { case (id, d, ms) =>
            println(f"[cdc]    job $id%4d ${ms / 1e3}%7.3f s  ${d.take(60)}") }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))

      case "ivftrace" =>
        import org.apache.spark.sql.functions._
        import graft.operators.IvfIndex
        val itrace = new JobTrace
        spark.sparkContext.addSparkListener(itrace)
        warmup(spark, sfDir)
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        (1 to 3).foreach { i =>
          itrace.drain()
          val idx = SparkEntry.scratchDir("graft-ivftrace")
          val t0 = System.nanoTime()
          try IvfIndex.build(idx, e, col("vec_id"), col("embedding"), SparkEntry.IvfCfg)
          finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
          println(f"[ivftrace] build ${(System.nanoTime() - t0) / 1e9}%7.3f s")
          Thread.sleep(100)
          if (i == 3) itrace.drain().foreach { case (id, d, ms) =>
            println(f"[ivftrace]    job $id%4d ${ms / 1e3}%7.3f s") }
        }

      case "fixture" =>
        val (t, v1, v2) = SparkEntry.twoPhaseTableCached(spark, sfDir)
        val s1 = t.snapshotAt(v1); val s2 = t.snapshotAt(v2)
        println(s"[fixture] v1=$v1 base=${s1.files.size} delta=${s1.deltaFiles.size} rows=${s1.files.map(_.rows).sum}")
        println(s"[fixture] v2=$v2 base=${s2.files.size} delta=${s2.deltaFiles.size} rows=${s2.files.map(_.rows).sum}")
        println(s"[fixture] numBuckets=${s2.numBuckets}")
        s2.files.groupBy(_.path.split("/").head).foreach { case (k, v) =>
          println(s"[fixture] commit-dir $k: ${v.size} files, ${v.map(_.rows).sum} rows, ${v.map(_.bytes).sum} bytes") }
        println("[fixture] sample paths:\n  " + s2.files.take(5).map(_.path).mkString("\n  "))
        val parts = s2.files.map(_.path.split("/").last.split("-")(1).toInt)
        println(s"[fixture] distinct part numbers: ${parts.distinct.size} max=${parts.max}")
        val byBucket = s2.files.groupBy(_.bucket).view.mapValues(_.size).toMap
        println(s"[fixture] files per bucket: min=${byBucket.values.min} max=${byBucket.values.max}")
        println(s"[fixture] rows per file: min=${s2.files.map(_.rows).min} max=${s2.files.map(_.rows).max}")

      case "joinprobe" =>
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val a = (0 until 1000).map(i => (s"r$i", s"p$i", i)).toDF("repo", "path", "x")
          .withColumn("_jb", pmod(hash(col("repo"), col("path")), lit(16)))
          .repartition(16, col("_jb")).alias("b")
        val d = (500 until 1500).map(i => (s"r$i", s"p$i", i)).toDF("repo", "path", "y")
          .withColumn("_jb", pmod(hash(col("repo"), col("path")), lit(16)))
          .repartition(16, col("_jb")).alias("d")
        val j = a.join(d, col("b._jb") === col("d._jb") &&
          col("b.repo") === col("d.repo") && col("b.path") === col("d.path"), "full_outer")
        println("conf=" + spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition"))
        j.explain("formatted")

      case other => println(s"unknown mode: $other (use plans|micro|fixture|joinprobe)")
    }
    spark.stop()
  }
}
