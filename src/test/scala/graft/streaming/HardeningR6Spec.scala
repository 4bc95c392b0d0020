package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSuite

/** Round-6 hardening regressions (ADVICE items): checkpoint-lineage path
  * normalization, catalog partition discovery past stray dirs, retention
  * partition parsing anchored to the lake root, manifest-recorded
  * basePath, and replay-safe embedding-index pair orientation.
  */
class HardeningR6Spec extends SparkSuite {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("value", DoubleType), StructField("ts", TimestampType),
      StructField("event_id", LongType)))),
    StructField("metadata", StructType(Seq(StructField("op", StringType))))))

  private val clock = Some(java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13"))

  test("same checkpoint spelled differently is a replay, not a reset (lineage normalization)") {
    val base = tmpDir("graft-ckspell-")
    val events = graft.queries.Registry.tbl(spark, sfDir, "events").limit(20)
    graft.sources.ShardedLog.put(graft.sources.ShardedLog.fromEvents(events), s"$base/log")
    def flatBatch = {
      val frame = Deliver.transform(
        spark.read.schema(graft.sources.ShardedLog.schema).parquet(s"$base/log"),
        payloadSchema, clock)
      frame.select(col("partition_key"), col("sequence_number"), col("env.data.*"),
        col("env.metadata.op").as("op"), col("processed_at"),
        col("year"), col("month"), col("day"), col("hour"),
        col("env").isNotNull.and(col("env.data").isNotNull).as("__ok"),
        col("data").as("__raw"))
    }
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck", clock = clock)
    Deliver.deliverBatch(flatBatch, 0L, cfg)
    assert(spark.read.parquet(s"$base/lake").count() == 20)
    // trailing slash, file: scheme, redundant segment — all the SAME
    // checkpoint; each must skip as a genuine replay, not throw
    for (spelling <- Seq(s"$base/ck/", s"file:$base/ck", s"$base/./ck")) {
      Deliver.deliverBatch(flatBatch, 0L, cfg.copy(checkpointDir = spelling))
      assert(spark.read.parquet(s"$base/lake").count() == 20, spelling)
    }
    // a genuinely different checkpoint still fails fast
    val e = intercept[IllegalStateException] {
      Deliver.deliverBatch(flatBatch, 0L, cfg.copy(checkpointDir = s"$base/ck2"))
    }
    assert(e.getMessage.contains("reset checkpoint"))
  }

  test("catalog partition discovery skips a stray non-partition dir beside the partition dirs") {
    val lake = tmpDir("graft-stray-") + "/lake"
    Seq((1L, 2024, 1), (2L, 2024, 2), (3L, 2025, 1))
      .toDF("id", "year", "month")
      .write.partitionBy("year", "month").parquet(lake)
    // a stray dir that lists BEFORE year=... must not end discovery early
    Files.createDirectories(Paths.get(lake, "aaa_extras"))
    graft.catalog.LakeCatalog.registerLake(spark, "stray_part_tbl", lake)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("stray_part_tbl"))
    assert(meta.partitionColumnNames == Seq("year", "month"))
    assert(spark.table("stray_part_tbl").where($"year" === 2024).count() == 2)
    spark.sql("DROP TABLE stray_part_tbl")
  }

  test("retention ignores k=v segments in ancestor dirs above the lake root") {
    // a day-partitioned lake under an ancestor dir named hour=0: the sweep
    // must find NO hour partition value (partStart undefined) and drop
    // nothing, rather than treating the whole day as expired hour 0
    val lake = tmpDir("graft-ret-anc-") + "/hour=0/lake"
    Seq((1L, 2024, 1, 1), (2L, 2024, 1, 2))
      .toDF("id", "year", "month", "day")
      .write.partitionBy("year", "month", "day").parquet(lake)
    val stats = Retention.sweep(spark, lake,
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(stats == Compact.Stats(0, 0, 0))
    assert(spark.read.parquet(lake).count() == 2)
  }

  test("manifest-recorded basePath stops partition discovery at the true lake root") {
    // an UNPARTITIONED lake whose root dir is named like a partition dir:
    // the recorded basePath keeps `run` out of the read schema
    val base = tmpDir("graft-mbase-")
    val lake = s"$base/run=7"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(lake)
    val files = Files.walk(Paths.get(lake)).iterator()
    val urls = new scala.collection.mutable.ArrayBuffer[String]
    files.forEachRemaining { p =>
      if (p.toString.endsWith(".parquet")) urls += s"file:$p"
    }
    Files.createDirectories(Paths.get(s"$base/manifest"))
    Files.write(Paths.get(s"$base/manifest/manifest-0000000000.json"),
      ManifestChain.render(urls.toSeq.sorted, Some(s"file:$lake")).getBytes("UTF-8"))
    val df = graft.sources.ManifestReader.read(spark, s"$base/manifest")
    assert(df.schema.fieldNames.toSet == Set("id", "v"), df.schema.treeString)
    assert(df.count() == 2)
    // foreign manifest without basePath: heuristic fallback still reads
    Files.write(Paths.get(s"$base/manifest/manifest-0000000000.json"),
      ManifestChain.render(urls.toSeq.sorted, None).getBytes("UTF-8"))
    assert(graft.sources.ManifestReader.read(spark, s"$base/manifest").count() == 2)
  }

  test("delivery manifests carry the lake root and the reader preserves partition columns") {
    val base = tmpDir("graft-mbase2-")
    val events = graft.queries.Registry.tbl(spark, sfDir, "events").limit(30)
    graft.sources.ShardedLog.put(graft.sources.ShardedLog.fromEvents(events), s"$base/log")
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck",
      manifestDir = Some(s"$base/manifest"),
      trigger = Trigger.AvailableNow(), clock = clock)
    val q = Deliver.start(
      graft.sources.ShardedLog.readStream(spark, s"$base/log"), payloadSchema, cfg)
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val manifest = Files.readString(
      Files.list(Paths.get(s"$base/manifest")).iterator().asScala
        .find(p => p.getFileName.toString.matches("manifest-\\d+\\.json")).get)
    assert(ManifestChain.parseBasePath(manifest).exists(_.endsWith("/lake")), manifest)
    val df = graft.sources.ManifestReader.read(spark, s"$base/manifest")
    assert(Seq("year", "month", "day", "hour").forall(df.schema.fieldNames.contains))
    assert(df.count() == 30)
  }

  test("embedding index emits one row per pair when a batch redelivers already-indexed ids") {
    val base = tmpDir("graft-embdup-")
    val src = s"$base/src"
    val t0 = System.currentTimeMillis() - 60000
    def stage(name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-emb-stage-").toString
      Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Seq(1.0f, 0.01f, 0.0f, 0.0f)))
        .toDF("id", "emb").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(src))
      Files.move(part.toPath, Paths.get(src, s"$name.parquet"))
      Files.setLastModifiedTime(Paths.get(src, s"$name.parquet"), FileTime.fromMillis(mtime))
    }
    // batch 1 redelivers batch 0's records verbatim (at-least-once source)
    stage("b0", t0)
    stage("b1", t0 + 2000)
    val emb = spark.readStream
      .schema("id long, emb array<float>")
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    val q = EmbeddingIndex.start(emb, "id", "emb", dim = 4,
      s"$base/index", s"$base/out", s"$base/ck", threshold = 0.9)
    q.awaitTermination()
    // batch 0: within-batch pair, canonical orientation (greater, smaller)
    val b0 = spark.read.parquet(s"$base/out/batch=0")
      .select($"id_new", $"id_other").as[(Long, Long)].collect().toSeq
    assert(b0 == Seq((2L, 1L)), s"batch 0: $b0")
    // batch 1: both members are in the batch AND in the index — exactly
    // one row, not the same pair in both orientations
    val b1 = spark.read.parquet(s"$base/out/batch=1")
      .select($"id_new", $"id_other").as[(Long, Long)].collect().toSeq
    assert(b1 == Seq((2L, 1L)), s"batch 1: $b1")
  }
}
