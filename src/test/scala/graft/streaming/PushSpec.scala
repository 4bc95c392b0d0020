package graft.streaming

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import graft.SparkSuite

/** Generic push destination (K-series "deliver to any service"): batched
  * sends, exponential-backoff retries, DLQ on exhaustion, fail-the-batch
  * when no DLQ is configured. The destination is an in-JVM sink — local[n]
  * executors share statics, so delivered/attempt counters are observable.
  */
object PushSpecState {
  val attempts = new ConcurrentHashMap[String, AtomicInteger]()
  val delivered = new ConcurrentHashMap[String, ConcurrentLinkedQueue[String]]()
  def attemptsFor(key: String): AtomicInteger =
    attempts.computeIfAbsent(key, _ => new AtomicInteger)
  def deliveredFor(key: String): ConcurrentLinkedQueue[String] =
    delivered.computeIfAbsent(key, _ => new ConcurrentLinkedQueue[String])
}

/** Fails the first `failFirst` send() calls ACROSS the destination (shared
  * counter), then delivers — a transiently-unavailable endpoint.
  */
class FlakyClient(key: String, failFirst: Int) extends Push.Client {
  override def send(batch: Seq[String]): Unit = {
    val n = PushSpecState.attemptsFor(key).incrementAndGet()
    if (n <= failFirst) throw new RuntimeException(s"transient failure $n")
    batch.foreach(PushSpecState.deliveredFor(key).add)
  }
}

/** Never succeeds — a down endpoint. */
class DownClient(key: String) extends Push.Client {
  override def send(batch: Seq[String]): Unit = {
    PushSpecState.attemptsFor(key).incrementAndGet()
    throw new RuntimeException("endpoint down")
  }
}

class PushSpec extends SparkSuite {
  import spark.implicits._

  private def sourceDir(n: Int): String = {
    val dir = tmpDir("graft-push-src-") + "/data"
    (1 to n).map(i => s"rec-$i").toDF("payload").write.parquet(dir)
    dir
  }

  private def stream(dir: String) =
    spark.readStream.schema("payload STRING").parquet(dir)

  test("transient failures are retried with backoff until the batch lands") {
    val key = "flaky-" + java.util.UUID.randomUUID
    val dir = sourceDir(40)
    val q = Push.start(stream(dir), col("payload"), () => new FlakyClient(key, 2),
      Push.Config(checkpointDir = tmpDir("graft-push-ck-"),
        batchSize = 10, maxRetries = 3, baseBackoffMs = 1,
        trigger = Trigger.AvailableNow()))
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val got = PushSpecState.deliveredFor(key).iterator.asScala.toVector
    assert(got.sorted == (1 to 40).map(i => s"rec-$i").sorted.toVector,
      s"every record must deliver exactly once, got ${got.size}")
    assert(PushSpecState.attemptsFor(key).get > got.size / 10,
      "the failed attempts must have been retried")
  }

  test("exhausted retries route the batch to the DLQ; the stream survives") {
    val key = "down-" + java.util.UUID.randomUUID
    val dir = sourceDir(25)
    val dlq = tmpDir("graft-push-dlq-")
    val q = Push.start(stream(dir), col("payload"), () => new DownClient(key),
      Push.Config(checkpointDir = tmpDir("graft-push-ck-"), dlqDir = Some(dlq),
        batchSize = 10, maxRetries = 2, baseBackoffMs = 1,
        trigger = Trigger.AvailableNow()))
    q.awaitTermination() // must NOT throw — failures are data, not crashes
    val failed = spark.read.parquet(dlq)
    assert(failed.count() == 25)
    assert(failed.select($"reason").as[String].head().contains("endpoint down"))
    // each group: 1 initial + 2 retries
    assert(PushSpecState.attemptsFor(key).get >= 3)
  }

  test("no DLQ configured: exhausted retries fail the query, never drop records") {
    val key = "nodlq-" + java.util.UUID.randomUUID
    val dir = sourceDir(5)
    val q = Push.start(stream(dir), col("payload"), () => new DownClient(key),
      Push.Config(checkpointDir = tmpDir("graft-push-ck-"),
        batchSize = 10, maxRetries = 1, baseBackoffMs = 1,
        trigger = Trigger.AvailableNow()))
    val e = intercept[StreamingQueryException](q.awaitTermination())
    assert(e.getMessage.contains("failed after") ||
      String.valueOf(e.getCause).contains("failed after"))
  }
}
