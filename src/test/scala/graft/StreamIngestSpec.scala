package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{ShardedLog, StreamIngest}

/** Source facade: the emulated backend round-trips the envelope; the
  * kinesis/kafka branches are production wiring (connectors absent in the
  * offline container) — their option surface is exercised up to load().
  */
class StreamIngestSpec extends SparkSuite {
  import spark.implicits._

  test("emulated source streams the envelope columns") {
    val base = tmpDir("graft-ingest-")
    ShardedLog.put(ShardedLog.fromEvents(
      graft.queries.Registry.tbl(spark, sfDir, "events").limit(40)), s"$base/log")
    val df = StreamIngest.readStream(spark, StreamIngest.Emulated(s"$base/log"))
    assert(df.isStreaming)
    // shard_id is the log's Hive partition column, so it reads back last
    assert(df.columns.toSet == Set("stream_name", "shard_id", "partition_key",
      "sequence_number", "approx_arrival_ts", "data"))
    val q = df.writeStream.format("memory").queryName("ingest_test")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("ingest_test").count() == 40)
  }

  test("audit trail is queryable as a DataFrame (O4)") {
    val audit = new graft.audit.AuditListener
    spark.streams.addListener(audit)
    try {
      val base = tmpDir("graft-audf-")
      ShardedLog.put(ShardedLog.fromEvents(
        graft.queries.Registry.tbl(spark, sfDir, "events").limit(30)), s"$base/log")
      val q = StreamIngest.readStream(spark, StreamIngest.Emulated(s"$base/log"))
        .writeStream.format("memory").queryName("audit_df_test")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val deadline = System.currentTimeMillis() + 10000
      while (audit.entries.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val df = audit.toDF(spark)
      assert(df.columns.contains("numInputRows") && df.columns.contains("batchDurationMs"))
      assert(df.agg(sum($"numInputRows")).as[Long].head() >= 30)
    } finally spark.streams.removeListener(audit)
  }
}
