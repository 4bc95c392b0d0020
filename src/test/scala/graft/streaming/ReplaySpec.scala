package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSuite
import graft.sources.ShardedLog

/** Replay idempotence of the foreachBatch sinks — a crash between sink work
  * and checkpoint commit re-invokes the batch; delivery must not
  * double-count (code-review finding regression tests).
  */
class ReplaySpec extends SparkSuite {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("value", DoubleType), StructField("ts", TimestampType),
      StructField("event_id", LongType)))),
    StructField("metadata", StructType(Seq(StructField("op", StringType))))))
  private val clock = Some(java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13"))

  test("replayed deliverBatch is a no-op (commit marker)") {
    val base = tmpDir("graft-replaydb-")
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck",
      manifestDir = Some(s"$base/manifest"), clock = clock)
    val batch = Deliver.transform(
      ShardedLog.fromEvents(graft.queries.Registry.tbl(spark, sfDir, "events").limit(50)),
      payloadSchema, clock)
      .select(col("partition_key"), col("sequence_number"), col("env.data.*"),
        col("env.metadata.op").as("op"), col("processed_at"),
        col("year"), col("month"), col("day"), col("hour"),
        col("__ok"), col("data").as("__raw"))
    Deliver.deliverBatch(batch, 7L, cfg)
    val n1 = spark.read.parquet(s"$base/lake").count()
    Deliver.deliverBatch(batch, 7L, cfg) // replay of the same batch id
    assert(spark.read.parquet(s"$base/lake").count() == n1)
    assert(n1 == 50)
    // manifest still lists each file once
    val urls = graft.sources.ManifestReader.latestManifestFiles(spark, s"$base/manifest")
    assert(urls.distinct.size == urls.size)
    assert(graft.sources.ManifestReader.read(spark, s"$base/manifest").count() == 50)

    // crash window: manifest written but marker lost → replay must not
    // double-list the batch (earlier attempt's files become orphans)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$base/lake", "_commits", f"${7L}%010d"))
    Deliver.deliverBatch(batch, 7L, cfg)
    assert(graft.sources.ManifestReader.read(spark, s"$base/manifest").count() == 50,
      "manifest readers must see exactly one copy after a mid-batch replay")
  }

  test("replayed UpsertSink batch is a no-op (pointer-encoded batch id)") {
    val base = tmpDir("graft-replayus-")
    val changes = Seq((1L, "v1", "U", 1L), (2L, "v2", "U", 2L))
      .toDF("id", "payload", "op", "seq")
    UpsertSink.applyBatch(changes, 3L, s"$base/table", "id", "op", Seq("seq"))
    val snap1 = UpsertSink.currentSnapshot(s"$base/table")
    UpsertSink.applyBatch(changes, 3L, s"$base/table", "id", "op", Seq("seq")) // replay
    assert(UpsertSink.currentSnapshot(s"$base/table") == snap1)
    val state = UpsertSink.readTable(spark, s"$base/table").get
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    assert(state == Map(1L -> "v1", 2L -> "v2"))
    // a LATER batch still applies
    UpsertSink.applyBatch(Seq((1L, "v9", "U", 9L)).toDF("id", "payload", "op", "seq"),
      4L, s"$base/table", "id", "op", Seq("seq"))
    val state2 = UpsertSink.readTable(spark, s"$base/table").get
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    assert(state2 == Map(1L -> "v9", 2L -> "v2"))
    // an OLDER batch id (fresh/reset checkpoint against an advanced table)
    // must fail fast, not corrupt the table
    intercept[IllegalStateException] {
      UpsertSink.applyBatch(changes, 2L, s"$base/table", "id", "op", Seq("seq"))
    }
  }

  test("orphan files stay invisible through the catalog table (commit-log read)") {
    val base = tmpDir("graft-orphtbl-")
    ShardedLog.put(ShardedLog.fromEvents(
      graft.queries.Registry.tbl(spark, sfDir, "events").limit(80)), s"$base/log")
    val q = Deliver.start(ShardedLog.readStream(spark, s"$base/log"), payloadSchema,
      Deliver.Config(s"$base/lake", s"$base/ck", trigger = Trigger.AvailableNow(), clock = clock))
    q.awaitTermination()
    graft.catalog.LakeCatalog.registerLake(spark, "replay_orphan_tbl", s"$base/lake")
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val f = Files.walk(Paths.get(s"$base/lake")).iterator().asScala
      .find(p => p.toString.endsWith(".parquet") && !p.toString.contains("_spark_metadata")).get
    Files.copy(f, f.resolveSibling("part-99999-orphan.snappy.parquet"))
    spark.sql("REFRESH TABLE replay_orphan_tbl")
    assert(spark.sql("SELECT COUNT(*) FROM replay_orphan_tbl").head.getLong(0) == 80)
  }
}
