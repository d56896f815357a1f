package graft.consume

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Durable message-queue sink with AMQP-shaped semantics — the reference's
  * RabbitMQ consumer config surface (/root/reference/config/consumer.go:42-61:
  * `ChannelConfig`/`QueueConfig` exchange + queue declare options) realized as
  * a local durable queue layout (no broker exists offline; the SEMANTICS —
  * declare, bind, routed publish, fanout, consume-in-order — are real and
  * tested):
  *
  * {{{
  *   <root>/exchanges/<exchange>.json              // declare record (kind)
  *   <root>/bindings/<exchange>/<queue>=<routingKey>
  *   <root>/queues/<queue>/msg-<epochNanos>-<uuid>.jsonl
  * }}}
  *
  * `publish` routes by exchange kind: `fanout` delivers to every bound queue,
  * `direct` only to queues bound with the message's routing key. Messages are
  * written one FILE per task per publish (concurrent-writer safe — no shared
  * appends), and consumed in (timestamp, name) order.
  */
object LocalMq {

  def declareExchange(root: String, exchange: String, kind: String): Unit = {
    require(kind == "fanout" || kind == "direct", s"unsupported exchange kind: $kind")
    val p = Paths.get(root, "exchanges")
    Files.createDirectories(p)
    Files.writeString(p.resolve(s"$exchange.json"),
      graft.lake.Json.obj("exchange" -> graft.lake.Json.quote(exchange),
        "kind" -> graft.lake.Json.quote(kind)))
  }

  def bindQueue(root: String, exchange: String, queue: String, routingKey: String = ""): Unit = {
    val p = Paths.get(root, "bindings", exchange)
    Files.createDirectories(p)
    Files.writeString(p.resolve(s"$queue=$routingKey"), "")
    Files.createDirectories(Paths.get(root, "queues", queue))
  }

  private def exchangeKind(root: String, exchange: String): String = {
    val p = Paths.get(root, "exchanges", s"$exchange.json")
    require(Files.exists(p), s"exchange not declared: $exchange")
    graft.lake.Json.str(graft.lake.Json.parse(Files.readString(p)), "kind")
  }

  /** queues the (exchange, routingKey) pair routes to. */
  def route(root: String, exchange: String, routingKey: String): Seq[String] = {
    val kind = exchangeKind(root, exchange)
    val bdir = Paths.get(root, "bindings", exchange)
    if (!Files.isDirectory(bdir)) return Seq.empty
    graft.lake.LakeTable.listDir(bdir).map(_.getFileName.toString).collect {
      case b if kind == "fanout" => b.split("=", 2)(0)
      case b if b.split("=", 2).lift(1).getOrElse("") == routingKey => b.split("=", 2)(0)
    }.distinct.sorted
  }

  /** Publish a frame's rows (as JSON lines) to the exchange — executed per
    * partition on the executors; each task writes its own message file into
    * every routed queue. */
  def publish(df: DataFrame, root: String, exchange: String, routingKey: String): Unit = {
    val queues = route(root, exchange, routingKey)
    if (queues.isEmpty) return // unroutable drops, like an unbound AMQP exchange
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      val rows = it.toSeq
      if (rows.nonEmpty) {
        val body = rows.mkString("", "\n", "\n")
        val fname = f"msg-${System.nanoTime()}%020d-${java.util.UUID.randomUUID().toString.take(8)}.jsonl"
        queues.foreach { q =>
          val qdir = Paths.get(root, "queues", q)
          Files.createDirectories(qdir)
          Files.writeString(qdir.resolve(fname), body,
            StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        }
      }
    }
  }

  /** Consume a queue (non-destructive read of all pending messages, in
    * publish order) as a DataFrame of JSON rows. */
  def consume(spark: SparkSession, root: String, queue: String): DataFrame = {
    val qdir = Paths.get(root, "queues", queue)
    val files =
      if (Files.isDirectory(qdir))
        graft.lake.LakeTable.listDir(qdir).map(_.toString).sorted
      else Seq.empty
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.json(files: _*)
  }

  /** Destructive acknowledge: drop all currently-pending messages. */
  def purge(root: String, queue: String): Int = {
    val qdir = Paths.get(root, "queues", queue)
    if (!Files.isDirectory(qdir)) return 0
    val files = graft.lake.LakeTable.listDir(qdir)
    files.foreach(f => Files.deleteIfExists(f))
    files.size
  }
}

/** Consumer adapter over [[LocalMq]] — the MQ flavor of the reference's
  * transfer→solve consumer. */
final class MqConsumer(
    val name: String, root: String, exchange: String, routingKey: String = "")
    extends Consumer {
  override def solve(payload: DataFrame): Unit =
    LocalMq.publish(payload, root, exchange, routingKey)
}
