package graft

import graft.gen.{ChangelogGen, GenConfig}
import graft.lake.LakeTable
import graft.log.ChangeLog
import graft.streaming.StreamIngest
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

/** Live HTTP control/metrics plane on a running tail — the reference's
  * operator surface (/cobra/position, /rules/report, /rules/{name}/stop —
  * /root/reference/cobra/cobra_http.go:18-89, rules/factory_http.go:10-48)
  * served from the LakeTable's durable artifacts while the stream runs.
  */
class ControlPlaneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def get(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def post(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("/report, /progress, /stop work against a live tail") {
    val logDir = TestSpark.tmpDir("graft-http-log")
    val tableDir = TestSpark.tmpDir("graft-http-table")
    val ckptDir = TestSpark.tmpDir("graft-http-ckpt")
    val cfg = GenConfig(seed = 21L, nEvents = 6000L, nRepos = 20, pathsPerRepo = 10,
      nPartitions = 4, contentLen = 60)
    ChangeLog.write(ChangelogGen.events(spark, cfg), logDir, segmentsPerPartition = 6)
    LakeTable.create(spark, tableDir, numBuckets = 8)

    val tailThread = new Thread(() =>
      StreamIngest.tail(spark, logDir, tableDir, ckptDir, maxFilesPerTrigger = 2,
        httpPort = Some(0)))
    tailThread.start()
    try {
      // wait for the control plane to publish its port and a batch to commit
      val portFile = Paths.get(tableDir, "_control", "http.port")
      val deadline = System.currentTimeMillis() + 120000
      while ((!Files.exists(portFile) ||
        LakeTable.load(spark, tableDir).snapshot.version < 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(Files.exists(portFile), "control plane must publish its port")
      val port = Files.readString(portFile).trim.toInt

      val (rc, report) = get(port, "/report")
      assert(rc === 200)
      assert(report.contains("\"version\"") && report.contains("\"fence\"") &&
        report.contains("\"metrics\"") && report.contains("\"maxSeq\""),
        s"report must carry position + lineage: ${report.take(300)}")

      val (pc, progress) = get(port, "/progress")
      assert(pc === 200 && progress.startsWith("["))

      // /stop mutates state: GET must be rejected (CSRF to 127.0.0.1), POST works
      val (gc, _) = get(port, "/stop")
      assert(gc === 405, "GET /stop must be rejected")
      val (sc, stopBody) = post(port, "/stop")
      assert(sc === 200 && stopBody.contains("requested"))
      tailThread.join(120000)
      assert(!tailThread.isAlive, "tail must terminate after HTTP /stop")
    } finally if (tailThread.isAlive) {
      StreamIngest.requestStop(tableDir); tailThread.join(60000)
    }

    // the boundary stop lost nothing: resume to completion converges
    StreamIngest.runAvailable(spark, logDir, tableDir, ckptDir, maxFilesPerTrigger = 8)
    val oracle = graft.gen.Oracle.contentSha(
      graft.gen.Oracle.replay(ChangelogGen.eventsLocal(cfg)))
    assert(LakeTable.load(spark, tableDir).read().count().toInt === oracle.size)
  }

  test("/pause suspends the tail in-process; /start resumes it losslessly (rule stop/start analog)") {
    val logDir = TestSpark.tmpDir("graft-ps-log")
    val tableDir = TestSpark.tmpDir("graft-ps-table")
    val ckptDir = TestSpark.tmpDir("graft-ps-ckpt")
    val cfg = GenConfig(seed = 23L, nEvents = 5000L, nRepos = 20, pathsPerRepo = 10,
      nPartitions = 4, contentLen = 60)
    ChangeLog.write(ChangelogGen.events(spark, cfg), logDir, segmentsPerPartition = 4)
    LakeTable.create(spark, tableDir, numBuckets = 8)

    val tailThread = new Thread(() =>
      StreamIngest.tail(spark, logDir, tableDir, ckptDir, maxFilesPerTrigger = 4,
        httpPort = Some(0)))
    tailThread.start()
    try {
      val portFile = Paths.get(tableDir, "_control", "http.port")
      val deadline = System.currentTimeMillis() + 120000
      while ((!Files.exists(portFile) ||
        LakeTable.load(spark, tableDir).snapshot.version < 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      val port = Files.readString(portFile).trim.toInt

      val (pc, _) = post(port, "/pause")
      assert(pc === 200)
      val d2 = System.currentTimeMillis() + 120000
      while (get(port, "/state")._2 != """{"state":"paused"}""" &&
        System.currentTimeMillis() < d2) Thread.sleep(200)
      assert(get(port, "/state")._2 === """{"state":"paused"}""",
        "tail must report paused at a batch boundary")
      assert(tailThread.isAlive, "pause must keep the tail process alive")
      val vPaused = LakeTable.load(spark, tableDir).snapshot.version

      // new data arrives WHILE paused: a fresh segment file (copy of an
      // existing one — its re-delivered events are absorbed by LWW, but the
      // batch commit still advances the snapshot version on resume)
      val part0 = Files.list(Paths.get(logDir)).filter(_.getFileName.toString.startsWith("partition=")).findFirst().get()
      val seg = Files.list(part0).filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      val extra = part0.resolve("part-extra-resume.parquet")
      Files.copy(seg, extra)
      Files.setLastModifiedTime(extra,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      Thread.sleep(1000)
      assert(LakeTable.load(spark, tableDir).snapshot.version === vPaused,
        "a paused tail must not process new segments")

      val (rc2, _) = post(port, "/start")
      assert(rc2 === 200)
      val d3 = System.currentTimeMillis() + 120000
      while (LakeTable.load(spark, tableDir).snapshot.version <= vPaused &&
        System.currentTimeMillis() < d3) Thread.sleep(200)
      assert(LakeTable.load(spark, tableDir).snapshot.version > vPaused,
        "the resumed tail must process segments that arrived while paused")
      // drain: wait until the whole log (incl. the extra segment) is applied
      // before stopping — the fence must cover every partition's top offset
      val expectedFence = ChangelogGen.eventsLocal(cfg)
        .groupBy(_.partition).map { case (p, es) => p -> es.map(_.offset).max }
      def fenceCaughtUp(): Boolean = {
        val f = LakeTable.load(spark, tableDir).snapshot.fence
        expectedFence.forall { case (p, o) => f.getOrElse(p, -1L) >= o }
      }
      val d4 = System.currentTimeMillis() + 120000
      while (!fenceCaughtUp() && System.currentTimeMillis() < d4) Thread.sleep(200)
      assert(fenceCaughtUp(), "resumed tail must drain the whole log")

      val (sc, _) = post(port, "/stop")
      assert(sc === 200)
      tailThread.join(120000)
      assert(!tailThread.isAlive, "stop must end a resumed tail")
    } finally if (tailThread.isAlive) {
      StreamIngest.requestStop(tableDir); tailThread.join(60000)
    }

    // duplicates from the re-delivered segment were absorbed: content equals
    // the oracle replay of the ORIGINAL log
    val oracle = graft.gen.Oracle.contentSha(
      graft.gen.Oracle.replay(ChangelogGen.eventsLocal(cfg)))
    assert(LakeTable.load(spark, tableDir).read().count().toInt === oracle.size)
  }
}
