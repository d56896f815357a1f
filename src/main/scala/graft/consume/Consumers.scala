package graft.consume

import org.apache.spark.sql.DataFrame

/** Consumer surface — the reference's transfer→solve pipeline
  * (/root/reference/rules/base_ruler.go:172-178 transfer registry,
  * /root/reference/consumes/base_consumer.go:96-127 invoke/solve,
  * /root/reference/consumes/factory.go:25-35 name→maker registry):
  *
  *  - `transfer` reshapes an event-group frame into the sink payload
  *    (default identity, like the reference's default transfer);
  *  - `solve` performs the sink action;
  *  - consumers are registered by name and fanned out to concurrently per
  *    batch (the reference pushes each group to every consumer factory,
  *    /root/reference/rules/base_ruler.go:282-293).
  *
  * Errors never stop the stream: a failing consumer is recorded and skipped
  * (the reference recovers panics to errors, base_consumer.go:96-127).
  */
trait Consumer extends Serializable {
  def name: String
  /** serialize/reshape the batch for this sink (default: identity). */
  def transfer(batch: DataFrame): DataFrame = batch
  /** the sink action. */
  def solve(payload: DataFrame): Unit
}

/** Print/file sink — the reference's example consumer
  * (/root/reference/examples/01-print/main.go:51-83). */
final class FileConsumer(val name: String, dir: String, format: String = "parquet")
    extends Consumer {
  override def solve(payload: DataFrame): Unit =
    payload.write.mode("append").format(format).save(s"$dir/$name")
}

final class ConsumerRegistry {
  private val makers = scala.collection.mutable.Map.empty[String, () => Consumer]
  private val failures = scala.collection.concurrent.TrieMap.empty[String, String]

  def register(name: String, maker: () => Consumer): Unit = makers(name) = maker
  def make(name: String): Consumer =
    makers.getOrElse(name, throw new IllegalArgumentException(s"no consumer maker: $name"))()
  def names: Seq[String] = makers.keys.toSeq.sorted
  def lastFailures: Map[String, String] = failures.toMap

  /** Fan a batch out to all named consumers. Each consumer's transfer+solve
    * runs concurrently (Spark jobs from separate threads share the cluster),
    * mirroring the reference's per-consumer goroutine fan-out. */
  def fanOut(batch: DataFrame, consumerNames: Seq[String] = names): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ConsumerRegistry.pool
    val fs = consumerNames.map { n =>
      Future {
        val c = make(n)
        try c.solve(c.transfer(batch))
        catch { case e: Throwable => failures.put(n, e.toString); () }
      }
    }
    Await.result(Future.sequence(fs), Duration.Inf)
    ()
  }
}

object ConsumerRegistry {
  private lazy val pool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(8,
        (r: Runnable) => { val t = new Thread(r, "consumer-fanout"); t.setDaemon(true); t }))
}
