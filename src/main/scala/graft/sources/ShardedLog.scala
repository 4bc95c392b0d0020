package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.codec.Envelope

/** Offline emulation of the sharded, ordered, replayable record log
  * (README.md:43-53) as a file-backed Structured Streaming source.
  *
  * In production this is `spark.readStream.format("kinesis")` (or kafka) —
  * shard ⇒ source partition, SequenceNumber ⇒ offset. Offline (zero-egress
  * container) we persist the same record envelope to a parquet directory
  * and stream it back with `readStream`; replay = re-read from the
  * directory with a fresh checkpoint (S5), rate limiting =
  * `maxFilesPerTrigger` (O3 backpressure analogue).
  */
object ShardedLog {

  /** Record-envelope schema (FIXTURES.md §A1). */
  val schema: StructType = StructType(Seq(
    StructField("stream_name", StringType),
    StructField("shard_id", StringType),
    StructField("partition_key", StringType),
    StructField("sequence_number", StringType),
    StructField("approx_arrival_ts", TimestampType),
    StructField("data", StringType) // base64 wire payload (README.md:224, 248)
  ))

  /** S1/S2 producer: turn the `events` table into wire records.
    * PartitionKey = "events-<user_id>" (schema-table-id, README.md:227);
    * shard = hash(partition_key) % nShards (README.md:47); sequence number =
    * zero-padded event_id (30-digit, README.md:238 — lexical order == numeric).
    */
  def fromEvents(events: DataFrame, nShards: Int = 4, stream: String = "rds-cdc-prod"): DataFrame = {
    val wire = Envelope.encode(struct(
      struct(col("user_id").as("id"), col("event_type").as("status"),
        col("value"), col("ts"), col("event_id")).as("data"),
      struct(when(col("event_type") === "error", "D").otherwise("U").as("op")).as("metadata")))
    events.select(
      lit(stream).as("stream_name"),
      concat(lit("shardId-"), lpad((pmod(hash(concat(lit("events-"), col("user_id"))), lit(nShards))).cast("string"), 12, "0")).as("shard_id"),
      concat(lit("events-"), col("user_id")).as("partition_key"),
      lpad(col("event_id").cast("string"), 30, "0").as("sequence_number"),
      col("ts").as("approx_arrival_ts"),
      wire.as("data"))
  }

  /** Persist producer output as the durable log (PutRecords, S1). Writing
    * partitioned by shard keeps per-shard order recoverable by sequence.
    */
  def put(records: DataFrame, dir: String): Unit =
    records.write.mode("append").partitionBy("shard_id").parquet(dir)

  /** Resharding (the reference's on-demand auto-scaling, README.md:36, 74:
    * shard count changes under load). Records are reassigned by the same
    * key-hash over the new shard count; per-key ordering is preserved
    * because a key's records still land in exactly one (new) shard and
    * sequence numbers are unchanged.
    */
  def reshard(records: DataFrame, newShards: Int): DataFrame =
    records.withColumn("shard_id",
      concat(lit("shardId-"),
        lpad(pmod(hash(col("partition_key")), lit(newShards)).cast("string"), 12, "0")))

  /** S3/S4 consumer: stream the log back, with the reference's buffer
    * admission semantics (README.md:368-380 "64 MB OR 60 s, whichever first"):
    *   - `maxBytesPerTrigger` is the SIZE half — each micro-batch admits
    *     files until the byte budget is hit (at least one file), so a flush
    *     happens at ~the byte cap even under a long trigger interval;
    *   - the time half is the query trigger (`Trigger.ProcessingTime`),
    *     which flushes whatever has accumulated when the interval fires.
    * `maxFilesPerTrigger` remains the file-count form (O3 backpressure).
    */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    maxBytesPerTrigger.foreach(n => r.option("maxBytesPerTrigger", n))
    r.parquet(dir)
  }
}
