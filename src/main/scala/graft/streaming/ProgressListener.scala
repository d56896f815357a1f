package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Run-report listener — the Spark-native replacement for the reference's
  * HTTP `/rules/report` plane (/root/reference/rules/factory_http.go:50-89,
  * cobra/handler_http.go:10-50): every micro-batch's progress (rows, offsets,
  * durations) is appended as JSONL under `<tableDir>/_progress/`, alongside
  * the engine's own `_lineage`. `graft.app.Main report` reads it back.
  *
  * Progress lines are observability metadata (at-least-once on retries, like
  * Spark's own progress log) — exactly-once truth lives in the snapshot
  * fence/lineage.
  */
class ProgressListener(tableDir: String) extends StreamingQueryListener {
  private val dir = Paths.get(tableDir, "_progress")

  private def append(line: String): Unit = synchronized {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("progress.jsonl"), line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    append(s"""{"event":"started","id":"${e.id}","runId":"${e.runId}","ts":"${e.timestamp}"}""")

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    append(e.progress.json)

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    append(s"""{"event":"terminated","id":"${e.id}","runId":"${e.runId}",""" +
      s""""exception":${e.exception.map(x => "\"" + x.replace("\"", "'").take(300) + "\"").getOrElse("null")}}""")
}
