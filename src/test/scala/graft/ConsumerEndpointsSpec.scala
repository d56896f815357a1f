package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.consume.{ConsumerRegistry, HttpConsumer, LocalMq, MqConsumer, Sentinel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

/** HTTP / MQ / sentinel consumer endpoints, driven against a real loopback
  * HTTP server (JDK built-in; no egress) and the durable local queue layout —
  * the reference's consumer configs exercised end-to-end, not as stubs.
  */
class ConsumerEndpointsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withServer(handler: HttpExchange => (Int, String))(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, body) = handler(ex)
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/")
    finally server.stop(0)
  }

  private def sampleDf = {
    import spark.implicits._
    (0 until 20).map(i => (i.toLong, s"repo-${i % 3}", s"payload-$i"))
      .toDF("id", "repo", "data")
  }

  test("HttpConsumer posts JSON batches per partition and honors success_field/success_code") {
    val received = new ConcurrentLinkedQueue[String]()
    withServer { ex =>
      received.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      (200, """{"status":"ok"}""")
    } { url =>
      new HttpConsumer("http", url, maxRowsPerRequest = 7).solve(sampleDf)
      val rows = received.iterator()
      var lines = 0
      while (rows.hasNext) lines += rows.next().split("\n").count(_.nonEmpty)
      assert(lines === 20, "every row must arrive exactly once")
      assert(received.size >= 3, "maxRowsPerRequest must bound request bodies")
    }
  }

  test("HttpConsumer failure (wrong success_code / HTTP 500) is recorded by fan-out, never thrown") {
    withServer { _ => (200, """{"status":"degraded"}""") } { url =>
      val reg = new ConsumerRegistry
      reg.register("flaky-http", () => new HttpConsumer("flaky-http", url))
      reg.fanOut(sampleDf) // must not throw
      assert(reg.lastFailures.contains("flaky-http"))
      assert(reg.lastFailures("flaky-http").contains("status != ok") ||
        reg.lastFailures("flaky-http").contains("degraded"))
    }
    withServer { _ => (500, "boom") } { url =>
      val reg = new ConsumerRegistry
      reg.register("http500", () => new HttpConsumer("http500", url))
      reg.fanOut(sampleDf)
      assert(reg.lastFailures.contains("http500"))
    }
  }

  test("Sentinel echo-verify: acked alerts pass, unacked alerts fall back to the local journal") {
    val fallback = TestSpark.tmpDir("graft-sentinel")
    withServer { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      (200, body) // perfect echo
    } { url =>
      assert(new Sentinel(url, fallback).alert("merge conflict storm on repo-7"))
    }
    withServer { _ => (200, """{"ack":"maybe"}""") } { url =>
      assert(!new Sentinel(url, fallback).alert("lost alert"))
    }
    val journal = java.nio.file.Paths.get(fallback, "sentinel-fallback.jsonl")
    assert(java.nio.file.Files.readString(journal).contains("lost alert"),
      "unverified alerts must never be dropped silently")
  }

  test("LocalMq: fanout delivers to all bound queues, direct routes by key, consume preserves rows") {
    val root = TestSpark.tmpDir("graft-mq")
    LocalMq.declareExchange(root, "events-fan", "fanout")
    LocalMq.bindQueue(root, "events-fan", "q1")
    LocalMq.bindQueue(root, "events-fan", "q2")
    new MqConsumer("mq", root, "events-fan").solve(sampleDf)
    val q1 = LocalMq.consume(spark, root, "q1")
    val q2 = LocalMq.consume(spark, root, "q2")
    assert(q1.count() === 20 && q2.count() === 20)
    assert(q1.agg(sum("id")).collect()(0).getLong(0) === (0 until 20).sum.toLong)

    LocalMq.declareExchange(root, "events-dir", "direct")
    LocalMq.bindQueue(root, "events-dir", "hot", routingKey = "hot")
    LocalMq.bindQueue(root, "events-dir", "cold", routingKey = "cold")
    LocalMq.publish(sampleDf, root, "events-dir", routingKey = "hot")
    assert(LocalMq.consume(spark, root, "hot").count() === 20)
    assert(LocalMq.consume(spark, root, "cold").count() === 0)
    assert(LocalMq.purge(root, "hot") >= 1)
    assert(LocalMq.consume(spark, root, "hot").count() === 0)
  }
}
