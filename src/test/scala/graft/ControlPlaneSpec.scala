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
}
