package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Generic push destination (the reference's "deliver to OpenSearch /
  * Splunk / any HTTP service" target, README.md:15): a retrying batched
  * `foreachBatch` sink over a pluggable [[Push.Client]].
  *
  * Delivery semantics mirror the reference's Firehose contract: records are
  * pushed in bounded batches; a failed batch is retried with exponential
  * backoff; a batch that exhausts its retries is NOT dropped and does NOT
  * kill the stream — it lands in the DLQ prefix with the failure reason
  * (README.md:426's error routing, applied to the push path). Combined with
  * checkpointed offsets this gives at-least-once delivery to the
  * destination plus a lossless record of what never made it.
  *
  * Scale design: the client factory is instantiated ONCE PER PARTITION on
  * the executors (connection reuse, no driver round-trips); failures flow
  * back as data (a `Dataset` of failed payloads), so the DLQ write is a
  * distributed job, not a driver collect.
  */
object Push {

  /** Destination client. One instance per executor partition per batch;
    * `send` either delivers the whole batch or throws (partial delivery is
    * the destination's problem — idempotent destinations are assumed, as
    * with any at-least-once push).
    */
  trait Client extends Serializable {
    def send(batch: Seq[String]): Unit
    def close(): Unit = ()
  }

  final case class Config(
      checkpointDir: String,
      dlqDir: Option[String] = None,
      batchSize: Int = 500, // records per send() call (Firehose PutRecordBatch caps at 500)
      maxRetries: Int = 3,
      baseBackoffMs: Long = 100, // doubles per attempt: 100, 200, 400, …
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))

  /** Start pushing `payload` (one string per record — JSON, NDJSON line,
    * whatever the destination eats) to the destination built by `client`.
    */
  def start(records: DataFrame, payload: org.apache.spark.sql.Column,
      client: () => Client, cfg: Config): StreamingQuery =
    records.select(payload.cast("string").as("payload"))
      .writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(cfg.trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        pushBatch(batch, batchId, client, cfg)
      }
      .start()

  private[streaming] def pushBatch(batch: DataFrame, batchId: Long,
      client: () => Client, cfg: Config): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val payloads = batch.select(col("payload")).as[String]
    val failed: Dataset[(String, String)] = pushPartitions(payloads, client, cfg)
    cfg.dlqDir match {
      case Some(dlq) =>
        // idempotent per batch: replay replaces the attempt instead of
        // appending duplicates (same protocol as Deliver's error prefix)
        failed.toDF("payload", "reason")
          .write.mode("overwrite").parquet(s"$dlq/batch=$batchId")
      case None =>
        // no DLQ configured: exhausted retries must fail the batch (and the
        // query) rather than silently drop records
        val n = failed.count()
        if (n > 0) throw new IllegalStateException(
          s"push batch $batchId: $n records failed after ${cfg.maxRetries} retries " +
            "and no dlqDir is configured")
    }
  }

  /** Distributed push: group each partition's records into send-batches,
    * retry with exponential backoff, emit (payload, reason) for batches
    * that exhausted retries.
    */
  private def pushPartitions(payloads: Dataset[String], client: () => Client,
      cfg: Config): Dataset[(String, String)] = {
    val (batchSize, maxRetries, baseBackoff) = (cfg.batchSize, cfg.maxRetries, cfg.baseBackoffMs)
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      val c = client()
      val out = scala.collection.mutable.Buffer.empty[(String, String)]
      try {
        it.grouped(batchSize).foreach { group =>
          var attempt = 0
          var done = false
          var lastErr: Throwable = null
          while (!done && attempt <= maxRetries) {
            try { c.send(group); done = true }
            catch {
              case e: Exception =>
                lastErr = e
                attempt += 1
                if (attempt <= maxRetries)
                  Thread.sleep(baseBackoffMs(baseBackoff, attempt))
            }
          }
          if (!done) group.foreach(p => out += ((p, String.valueOf(lastErr))))
        }
      } finally c.close()
      out.iterator
    }
  }

  /** In-memory destination — the push-sink analogue of
    * `writeStream.format("memory")`: delivered payloads accumulate in a
    * process-local registry under `key`, for tests and the correctness
    * harness (single-JVM local mode; a real deployment implements
    * [[Client]] over the destination's SDK).
    */
  object MemoryDestination {
    private val store =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.Queue[String]]()
    def client(key: String): Client = new Client {
      def send(batch: Seq[String]): Unit = {
        val q = store.computeIfAbsent(key,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
        batch.foreach(q.add)
      }
    }
    /** Remove and return everything delivered under `key`. */
    def drain(key: String): Seq[String] = {
      val q = store.remove(key)
      if (q == null) Seq.empty
      else { import scala.jdk.CollectionConverters._; q.asScala.toSeq }
    }
  }

  /** Exponential backoff, capped so a misconfigured retry count cannot
    * sleep an executor for hours (overflow-safe shift).
    */
  private def baseBackoffMs(base: Long, attempt: Int): Long = {
    val shift = math.min(attempt - 1, 20)
    math.min(base << shift, 30000L)
  }
}
