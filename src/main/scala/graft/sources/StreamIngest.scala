package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source selection for the ingest path: one config surface, three
  * backends. The offline build runs [[Emulated]] (ShardedLog parquet dirs);
  * production deployments switch to [[Kinesis]] (spark-sql-kinesis
  * connector — the reference's stream, README.md:43-53) or [[Kafka]]
  * without touching pipeline code: all downstream stages consume the same
  * record-envelope columns.
  */
object StreamIngest {

  sealed trait SourceConfig
  /** Offline emulation: ShardedLog parquet directory. */
  final case class Emulated(dir: String, maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[Long] = None) // the size half of "64 MB OR 60 s"
      extends SourceConfig
  /** The native `graftlog` DataSourceV2 segment store
    * ([[graft.sources.v2.GraftLogTableProvider]]): SequenceNumber-range
    * offsets, per-shard ordering, byte/count admission, reshard pickup,
    * TRIM_HORIZON/LATEST/AT_SEQUENCE starting positions — the real shape
    * of the reference's S1–S5 consumer contract.
    */
  final case class GraftLog(dir: String,
      maxRecordsPerTrigger: Option[Long] = None,
      maxBytesPerTrigger: Option[Long] = None,
      startingPosition: String = "TRIM_HORIZON") extends SourceConfig
  /** Kinesis Data Streams via the spark-sql-kinesis connector.
    * `startingPosition`: TRIM_HORIZON | LATEST | AT_TIMESTAMP (S5 replay,
    * README.md:60, 81-83); `consumerArn` set ⇒ enhanced fan-out (S4,
    * README.md:91-111).
    */
  final case class Kinesis(streamName: String, region: String,
      startingPosition: String = "TRIM_HORIZON",
      consumerArn: Option[String] = None,
      maxFetchRate: Option[Int] = None) extends SourceConfig
  /** Kafka with the same envelope contract (key = partition key, value =
    * base64 wire payload).
    */
  final case class Kafka(bootstrap: String, topic: String,
      startingOffsets: String = "earliest") extends SourceConfig

  /** Build the streaming DataFrame for a source config. The emulated and
    * kafka/kinesis branches all yield the ShardedLog envelope columns.
    */
  def readStream(spark: SparkSession, cfg: SourceConfig): DataFrame = cfg match {
    case Emulated(dir, maxFiles, maxBytes) =>
      ShardedLog.readStream(spark, dir, maxFiles, maxBytes)
    case g: GraftLog =>
      val r = spark.readStream.format("graftlog")
        .option("startingPosition", g.startingPosition)
      g.maxRecordsPerTrigger.foreach(n => r.option("maxRecordsPerTrigger", n))
      g.maxBytesPerTrigger.foreach(n => r.option("maxBytesPerTrigger", n))
      r.load(g.dir)
    case k: Kinesis =>
      val r = spark.readStream.format("kinesis")
        .option("streamName", k.streamName)
        .option("region", k.region)
        .option("startingPosition", k.startingPosition)
      val r2 = k.consumerArn.fold(r)(arn => r.option("consumerArn", arn))
      val r3 = k.maxFetchRate.fold(r2)(n => r2.option("maxFetchRate", n.toString))
      kinesisEnvelope(r3.load())
    case kf: Kafka =>
      kafkaEnvelope(
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", kf.bootstrap)
          .option("subscribe", kf.topic)
          .option("startingOffsets", kf.startingOffsets)
          .load(),
        kf.topic)
  }

  /** spark-sql-kinesis connector columns → envelope columns. Factored off
    * `load()` so the mapping is testable offline on a connector-shaped
    * DataFrame (the connector itself needs a live stream).
    */
  def kinesisEnvelope(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.select(
      col("streamName").as("stream_name"),
      col("shardId").as("shard_id"),
      col("partitionKey").as("partition_key"),
      col("sequenceNumber").as("sequence_number"),
      col("approximateArrivalTimestamp").as("approx_arrival_ts"),
      base64(col("data")).as("data"))
  }

  /** Kafka source columns → envelope columns. Offset zero-padding keeps the
    * string ordering of `sequence_number` consistent with its numeric order
    * (the per-key ordering audits compare lexicographically, matching the
    * reference's zero-padded sequence numbers).
    */
  def kafkaEnvelope(raw: DataFrame, topic: String): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.select(
      lit(topic).as("stream_name"),
      concat(lit("shardId-"), lpad(col("partition").cast("string"), 12, "0")).as("shard_id"),
      col("key").cast("string").as("partition_key"),
      lpad(col("offset").cast("string"), 30, "0").as("sequence_number"),
      col("timestamp").as("approx_arrival_ts"),
      // envelope contract: `data` is base64 wire text. Kafka values are
      // raw bytes — encode them like the Kinesis branch does, so a topic
      // carrying non-base64 payloads can't silently DLQ the whole stream
      base64(col("value")).as("data"))
  }
}
