package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.sources.{ManifestReader, ShardedLog}
import graft.streaming.Deliver

/** S7 manifest-driven scan + B2 compaction + O3 rate-limited admission. */
class ManifestSpec extends SparkSuite {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("value", DoubleType), StructField("ts", TimestampType),
      StructField("event_id", LongType)))),
    StructField("metadata", StructType(Seq(StructField("op", StringType))))))
  private val clock = Some(java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13"))
  private def events(n: Int) = graft.queries.Registry.tbl(spark, sfDir, "events").limit(n)

  test("manifest scan reads exactly the listed files — orphans invisible (S7)") {
    val base = tmpDir("graft-mread-")
    ShardedLog.put(ShardedLog.fromEvents(events(100)), s"$base/log")
    val q = Deliver.start(ShardedLog.readStream(spark, s"$base/log"), payloadSchema,
      Deliver.Config(s"$base/lake", s"$base/ck", manifestDir = Some(s"$base/manifest"),
        trigger = Trigger.AvailableNow(), clock = clock))
    q.awaitTermination()
    val viaManifest = ManifestReader.read(spark, s"$base/manifest")
    assert(viaManifest.count() == 100)
    // torn write: orphan parquet dropped into the lake after the manifest
    import scala.jdk.CollectionConverters._
    val dataFile = Files.walk(Paths.get(s"$base/lake")).iterator().asScala
      .find(p => p.toString.endsWith(".parquet")).get
    Files.copy(dataFile, dataFile.resolveSibling("part-99999-orphan.parquet"))
    assert(ManifestReader.read(spark, s"$base/manifest").count() == 100,
      "manifest reader must not see unlisted files")
    // partition columns survive the manifest read path
    assert(viaManifest.columns.contains("hour"))
  }

  test("compaction yields one data file per flush (B2: 1000 records → 1 object)") {
    val base = tmpDir("graft-compact-")
    ShardedLog.put(ShardedLog.fromEvents(events(1000)
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 05:00:00")))), s"$base/log")
    val q = Deliver.start(ShardedLog.readStream(spark, s"$base/log"), payloadSchema,
      Deliver.Config(s"$base/lake", s"$base/ck", manifestDir = Some(s"$base/manifest"),
        compact = true, trigger = Trigger.AvailableNow(), clock = clock))
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val parts = Files.walk(Paths.get(s"$base/lake")).iterator().asScala
      .count(p => p.toString.endsWith(".parquet"))
    assert(parts == 1, s"expected 1 compacted file, got $parts")
    assert(spark.read.parquet(s"$base/lake").count() == 1000)
  }

  test("routeByTable lands records in per-table folders (K9)") {
    val base = tmpDir("graft-route-")
    ShardedLog.put(ShardedLog.fromEvents(events(50)), s"$base/log")
    val q = Deliver.start(ShardedLog.readStream(spark, s"$base/log"), payloadSchema,
      Deliver.Config(s"$base/lake", s"$base/ck", routeByTable = true,
        trigger = Trigger.AvailableNow(), clock = clock))
    q.awaitTermination()
    // partition_key = "events-<user>" → table prefix "events"
    assert(new java.io.File(s"$base/lake/table=events").isDirectory)
    val lake = spark.read.parquet(s"$base/lake")
    assert(lake.count() == 50 && lake.columns.contains("table"))
  }

  test("per-batch manifests are incremental: O(batch) entries, not O(history)") {
    val base = tmpDir("graft-incr-")
    // 4 shards → 4 files; 1 file per trigger → ≥4 batches, each with its own manifest
    ShardedLog.put(ShardedLog.fromEvents(events(400)), s"$base/log")
    val q = Deliver.start(
      ShardedLog.readStream(spark, s"$base/log", maxFilesPerTrigger = Some(1)),
      payloadSchema,
      Deliver.Config(s"$base/lake", s"$base/ck", manifestDir = Some(s"$base/manifest"),
        trigger = Trigger.AvailableNow(), clock = clock))
    q.awaitTermination()
    val hdir = new org.apache.hadoop.fs.Path(s"$base/manifest")
    val fs = hdir.getFileSystem(spark.sessionState.newHadoopConf())
    val manifests = graft.streaming.ManifestChain.list(fs, hdir)
    assert(manifests.size >= 2, s"expected one manifest per batch, got ${manifests.size}")
    // each incremental manifest lists strictly fewer files than the whole
    // lake: no manifest re-lists history
    val totalFiles = graft.streaming.ManifestChain
      .chainUrls(fs, hdir, Long.MaxValue).size
    manifests.filterNot(_._2).foreach { case (id, _, p) =>
      val in = fs.open(p)
      val n = try graft.streaming.ManifestChain.parseUrls(
        scala.io.Source.fromInputStream(in, "UTF-8").mkString).size finally in.close()
      assert(n < totalFiles, s"manifest $id lists $n of $totalFiles files — cumulative, not incremental")
    }
    // the resolved chain still sees every delivered record exactly once
    assert(ManifestReader.read(spark, s"$base/manifest").count() == 400)
    // no staged batch leftovers in the lake (the empty _staging root may remain)
    val stagingRoot = new org.apache.hadoop.fs.Path(s"$base/lake/_staging")
    assert(!fs.exists(stagingRoot) || fs.listStatus(stagingRoot).isEmpty,
      "staged batch dirs must be promoted and removed")
  }

  test("manifest chain compacts into a snapshot every Nth batch") {
    val base = tmpDir("graft-snap-")
    ShardedLog.put(ShardedLog.fromEvents(events(400)), s"$base/log")
    val q = Deliver.start(
      ShardedLog.readStream(spark, s"$base/log", maxFilesPerTrigger = Some(1)),
      payloadSchema,
      Deliver.Config(s"$base/lake", s"$base/ck", manifestDir = Some(s"$base/manifest"),
        manifestCompactEvery = 2, trigger = Trigger.AvailableNow(), clock = clock))
    q.awaitTermination()
    val hdir = new org.apache.hadoop.fs.Path(s"$base/manifest")
    val fs = hdir.getFileSystem(spark.sessionState.newHadoopConf())
    val manifests = graft.streaming.ManifestChain.list(fs, hdir)
    val snaps = manifests.filter(_._2)
    assert(snaps.nonEmpty, s"expected a snapshot manifest with compactEvery=2: $manifests")
    // a snapshot folds everything before it: reading the chain equals
    // reading snapshot ∪ later incrementals, and counts stay exact
    assert(ManifestReader.read(spark, s"$base/manifest").count() == 400)
    val resolved = graft.streaming.ManifestChain.chainFiles(fs, hdir)
    val latestSnapId = snaps.map(_._1).max
    assert(resolved.forall { p =>
      val n = p.getName.stripPrefix("manifest-").takeWhile(_.isDigit).toLong
      n >= latestSnapId
    }, s"chain must start at the latest snapshot: ${resolved.map(_.getName)}")
  }

  test("rate-limited admission processes the log in multiple micro-batches (O3/B1)") {
    val base = tmpDir("graft-rate-")
    val audit = new graft.audit.AuditListener
    spark.streams.addListener(audit)
    try {
      // 4 shards → 4 files; cap 1 file per trigger → ≥4 batches
      ShardedLog.put(ShardedLog.fromEvents(events(400)), s"$base/log")
      val q = Deliver.start(
        ShardedLog.readStream(spark, s"$base/log", maxFilesPerTrigger = Some(1)),
        payloadSchema,
        Deliver.Config(s"$base/lake", s"$base/ck", trigger = Trigger.AvailableNow(), clock = clock))
      q.awaitTermination()
      assert(spark.read.parquet(s"$base/lake").count() == 400)
      val deadline = System.currentTimeMillis() + 10000
      while (audit.entries.map(_.numInputRows).sum < 400 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      // hash distribution may leave a shard empty; the invariant is that
      // admission was split across multiple batches, one file at a time
      val batches = audit.entries.filter(_.numInputRows > 0)
      assert(batches.size >= 2, s"expected multiple rate-limited batches, got ${batches.size}")
      assert(batches.map(_.numInputRows).sum == 400)
    } finally spark.streams.removeListener(audit)
  }

  test("byte-budget admission flushes at ~the byte cap, independent of the trigger (B1)") {
    val base = tmpDir("graft-bytes-")
    ShardedLog.put(ShardedLog.fromEvents(events(400)), s"$base/log")
    // measure the log's file sizes, pick a budget ≈ 40% of the total: the
    // size-OR-time contract (README.md:368-380) means each flush must stop
    // admitting near the budget (one file of overshoot max) even though the
    // trigger (AvailableNow here, a long interval in production) would
    // happily take everything in one batch
    import scala.jdk.CollectionConverters._
    val sizes = Files.walk(Paths.get(s"$base/log")).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).map(p => Files.size(p)).toVector
    assert(sizes.size >= 3, s"need several log files, got ${sizes.size}")
    val budget = (sizes.sum * 2) / 5
    val audit = new graft.audit.AuditListener
    spark.streams.addListener(audit)
    try {
      val q = Deliver.start(
        ShardedLog.readStream(spark, s"$base/log", maxBytesPerTrigger = Some(budget)),
        payloadSchema,
        Deliver.Config(s"$base/lake", s"$base/ck", trigger = Trigger.AvailableNow(), clock = clock))
      q.awaitTermination()
      assert(spark.read.parquet(s"$base/lake").count() == 400)
      val deadline = System.currentTimeMillis() + 10000
      while (audit.entries.map(_.numInputRows).sum < 400 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val batches = audit.entries.filter(_.numInputRows > 0)
      // a 40% budget must split the log into ≥2 flushes, and no flush may
      // admit more rows than the budget-plus-one-file bound allows. Row
      // counts proxy bytes here (files are near-uniform): the max single
      // flush must stay well under "everything at once".
      assert(batches.size >= 2, s"byte budget ignored: ${batches.size} batch(es)")
      assert(batches.map(_.numInputRows).max < 400,
        s"one flush admitted the whole log despite the byte budget")
    } finally spark.streams.removeListener(audit)
  }
}
