package graft.consume

import org.apache.spark.sql.DataFrame
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP sink consumer — a real implementation of the reference's HTTP
  * consumer config surface (/root/reference/config/consumer.go:12-21:
  * `url / method / success_field / success_code`): each batch is serialized
  * to JSON lines and shipped in bounded-size requests; the response must be
  * HTTP 2xx AND carry `successField == successCode` in its JSON body, else
  * the request counts as failed (the registry's fan-out records the failure
  * and the stream continues — skip-and-report, like the reference).
  *
  * Scale shape: requests are issued PER PARTITION on the executors
  * (`foreachPartition`), never via a driver collect — N executors fan out to
  * the HTTP service in parallel, and `maxRowsPerRequest` bounds each body.
  */
final class HttpConsumer(
    val name: String,
    url: String,
    method: String = "POST",
    successField: String = "status",
    successCode: String = "ok",
    maxRowsPerRequest: Int = 500,
    timeoutMillis: Long = 10000) extends Consumer {

  override def solve(payload: DataFrame): Unit = {
    val (u, m, sf, sc, maxRows, tm) =
      (url, method, successField, successCode, maxRowsPerRequest, timeoutMillis)
    payload.toJSON.foreachPartition { (it: Iterator[String]) =>
      val client = HttpClient.newBuilder().connectTimeout(Duration.ofMillis(tm)).build()
      it.grouped(maxRows).foreach { rows =>
        val body = rows.mkString("\n")
        val req = HttpRequest.newBuilder(URI.create(u))
          .timeout(Duration.ofMillis(tm))
          .header("Content-Type", "application/json")
          .method(m, HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 != 2)
          throw new RuntimeException(s"http consumer: status ${resp.statusCode()}")
        if (!HttpConsumer.jsonFieldEquals(resp.body(), sf, sc))
          throw new RuntimeException(
            s"http consumer: response $sf != $sc in ${resp.body().take(200)}")
      }
    }
  }
}

object HttpConsumer {
  /** minimal success check: top-level JSON field equality. */
  private[consume] def jsonFieldEquals(body: String, field: String, want: String): Boolean =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      node.has(field) && node.get(field).asText() == want
    } catch { case _: Exception => false }
}

/** Error-alerting sentinel with echo verification — the reference's sentinel
  * error handler (/root/reference/config/sentinel.go:22-58, selected by
  * config/err_handler.go:10-28): errors are POSTed to an external service and
  * the response must ECHO the message back, proving the alert was actually
  * received (not just TCP-accepted). A failed/unverified alert falls back to
  * a local journal so the error is never silently dropped.
  */
final class Sentinel(url: String, fallbackDir: String, timeoutMillis: Long = 5000) {
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMillis)).build()

  /** @return true iff the sentinel echoed the message back. */
  def alert(msg: String): Boolean = {
    val ok =
      try {
        val body = graft.lake.Json.obj("error" -> graft.lake.Json.quote(msg))
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofMillis(timeoutMillis))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        resp.statusCode() / 100 == 2 && resp.body().contains(msg) // echo-verify
      } catch { case _: Exception => false }
    if (!ok) {
      val dir = java.nio.file.Paths.get(fallbackDir)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("sentinel-fallback.jsonl"),
        graft.lake.Json.obj("unackedAlert" -> graft.lake.Json.quote(msg)) + "\n",
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    }
    ok
  }
}
