package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.codec.Envelope

/** The fast alert path (SURVEY.md §7.1(5)): enhanced-fan-out consumer →
  * 3-line predicate → notification sink (README.md:90-111, 38).
  *
  * Latency semantics: micro-batch with `Trigger.ProcessingTime(0)` — drain
  * as fast as batches complete. The reference's 68 ms push latency is a
  * managed-service number below the micro-batch floor (BASELINE.md
  * non-goal); the contract preserved here is predicate → at-least-once
  * notification.
  */
object Alert {

  /** Decode + alert predicate (T8). `pred` sees the decoded envelope
    * columns (`env.*`).
    */
  def alerts(records: DataFrame, payloadSchema: StructType, pred: Column): DataFrame =
    records
      .withColumn("env", Envelope.decode(col("data"), payloadSchema))
      // env.data too: PERMISSIVE from_json turns corrupt JSON into an
      // all-null STRUCT, not a null — without the inner check a predicate
      // firing on null fields raises false alerts for garbage records
      .where(col("env").isNotNull && col("env.data").isNotNull && pred)
      .select(col("partition_key"), col("sequence_number"),
        col("approx_arrival_ts"), col("env.data.*"), col("env.metadata.op").as("op"))

  /** Start the alert query against a notifier callback (SNS stand-in, K6).
    * Notifications are per-batch (at-least-once on retry, like the
    * reference's Lambda consumer).
    */
  def start(records: DataFrame, payloadSchema: StructType, pred: Column,
      checkpointDir: String, notify: DataFrame => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    alerts(records, payloadSchema, pred)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) => notify(batch) }
      .start()

  /** Source-seam variant: same alert path, source chosen by config —
    * `Emulated(dir)` offline, `Kinesis(stream, region)`/`Kafka(...)` in
    * production. One line changes; the pipeline does not.
    */
  def start(spark: org.apache.spark.sql.SparkSession,
      source: graft.sources.StreamIngest.SourceConfig,
      payloadSchema: StructType, pred: Column,
      checkpointDir: String, notify: DataFrame => Unit): StreamingQuery =
    start(graft.sources.StreamIngest.readStream(spark, source),
      payloadSchema, pred, checkpointDir, notify)
}
