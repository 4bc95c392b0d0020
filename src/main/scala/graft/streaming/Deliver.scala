package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.codec.Envelope

/** The lake-delivery path (Firehose equivalent, SURVEY.md §7.1(4)):
  * micro-batch buffer → decode/enrich → Hive-partitioned parquet+snappy →
  * transactional visibility → portable manifest → error/DLQ + raw backup.
  *
  * Exactly-once: the parquet `FileStreamSink` commits each batch into
  * `_spark_metadata` (the native equivalent of the reference's
  * data-then-manifest protocol, README.md:291-303) and the checkpoint
  * stores source offsets (README.md:305-309) — at-least-once read +
  * idempotent/transactional sink ⇒ end-to-end exactly-once.
  */
object Deliver {

  final case class Config(
      lakeDir: String,
      checkpointDir: String,
      errorDir: Option[String] = None,
      backupDir: Option[String] = None,
      manifestDir: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"), // README.md:117 IntervalInSeconds=60
      maxRecordsPerFile: Long = 5000000,
      compact: Boolean = false, // B2: one output file per flush (README.md:259, 379-380)
      // true = reference semantics (README.md:130: partitions from the
      // PROCESSING-time template — each flush lands in one hour folder);
      // false = event-time partitions (deterministic for oracle tests)
      partitionByProcessingTime: Boolean = false,
      // K9 dynamic partitioning by content (README.md:157, 433): route each
      // record to a per-table folder derived from its partition key
      // ("schema-table-id" → table prefix)
      routeByTable: Boolean = false,
      clock: Option[java.sql.Timestamp] = None) // fixed clock for deterministic tests

  /** Decode wire records and derive the delivered-lake columns:
    * payload fields + processed_at + year/month/day/hour partitions.
    * Partition values derive from the payload event time when present,
    * else the arrival timestamp (README.md:130's timestamp template).
    */
  def transform(records: DataFrame, payloadSchema: StructType,
      clock: Option[java.sql.Timestamp],
      partitionByProcessingTime: Boolean = false): DataFrame = {
    val decoded = records
      .withColumn("env", Envelope.decode(col("data"), payloadSchema))
      .withColumn("__ok", col("env").isNotNull && col("env.data").isNotNull)
    val withPt = Envelope.withProcessedAt(decoded, clock)
    val ts =
      if (partitionByProcessingTime) col("processed_at")
      else coalesce(col("env.data.ts"), col("approx_arrival_ts"))
    Envelope.withTimePartitions(withPt, ts)
  }

  /** Start the delivery query: transactional partitioned parquet sink with
    * snappy compression (F1/F2/K1/K2/K3), plus — via foreachBatch when any
    * side output is configured — the portable manifest (K2), the error
    * prefix (K4) and the raw backup (K5).
    */
  def start(records: DataFrame, payloadSchema: StructType, cfg: Config): StreamingQuery = {
    val frame = transform(records, payloadSchema, cfg.clock, cfg.partitionByProcessingTime)
    val baseCols = Seq(
      col("partition_key"), col("sequence_number"),
      col("env.data.*"), col("env.metadata.op").as("op"),
      col("processed_at"), col("year"), col("month"), col("day"), col("hour"),
      col("__ok"), col("data").as("__raw"))
    val flat =
      if (cfg.routeByTable)
        frame.select(substring_index(col("partition_key"), "-", 1).as("table") +: baseCols: _*)
      else frame.select(baseCols: _*)
    val partCols =
      (if (cfg.routeByTable) Seq("table") else Seq.empty) ++ Seq("year", "month", "day", "hour")

    val needForeach = cfg.errorDir.isDefined || cfg.backupDir.isDefined || cfg.manifestDir.isDefined
    if (!needForeach) {
      flat.where(col("__ok")).drop("__ok", "__raw")
        .writeStream
        .format("parquet")
        .option("path", cfg.lakeDir)
        .option("compression", "snappy")
        .option("maxRecordsPerFile", cfg.maxRecordsPerFile)
        .partitionBy(partCols: _*)
        .option("checkpointLocation", cfg.checkpointDir)
        .trigger(cfg.trigger)
        .start()
    } else {
      flat.writeStream
        .option("checkpointLocation", cfg.checkpointDir)
        .trigger(cfg.trigger)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          deliverBatch(batch, batchId, cfg)
        }
        .start()
    }
  }

  /** One buffer flush (README.md:282-303): write data files, then — strictly
    * after — the manifest extending the previous one with exactly this
    * batch's files, then the batch commit marker. Replayed batches (crash
    * between sink work and checkpoint commit) are skipped via the marker;
    * a replay after a crash mid-batch re-writes the data, and the dir-diff
    * manifest lists only the successful attempt — earlier partial files
    * become orphans that manifest/commit-log readers never see. Exactly-once
    * therefore holds for manifest readers and checkpointed restarts; a raw
    * recursive directory listing (which the reference also forbids,
    * README.md:429 "never the folder") may see orphans.
    */
  private[streaming] def deliverBatch(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val marker = Paths.get(cfg.lakeDir, "_commits", f"$batchId%010d")
    if (Files.exists(marker)) return // replayed, already fully delivered

    val okAll = batch.where(col("__ok")).drop("__ok", "__raw")
    // B2 batch compaction: the reference's buffer flush emits ONE object per
    // flush (1000 records → 1 part file); coalesce(1) reproduces that.
    val ok = if (cfg.compact) okAll.coalesce(1) else okAll
    val partCols =
      (if (cfg.routeByTable) Seq("table") else Seq.empty) ++ Seq("year", "month", "day", "hour")

    val before = listParquet(cfg.lakeDir).toSet

    // 1. data files (PUT #1)
    ok.write.mode("append")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", cfg.maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(cfg.lakeDir)

    // 2. manifest (PUT #2, only after data success — README.md:419-430):
    // previous manifest's entries + exactly the files this attempt added
    cfg.manifestDir.foreach { mdir =>
      val added = listParquet(cfg.lakeDir).filterNot(before)
      // prev = latest manifest of a STRICTLY EARLIER batch: a crashed
      // attempt of THIS batch may have left manifest-<batchId> behind; its
      // entries must not leak into the replay's manifest (double-listing)
      val prev = Option(new java.io.File(mdir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("manifest-") &&
          f.getName < f"manifest-$batchId%010d.json")
        .sortBy(_.getName).lastOption
        .map(f => parseManifestUrls(Files.readString(f.toPath))).getOrElse(Seq.empty)
      val entries = (prev ++ added).distinct.sorted
        .map(f => s"""{"url": "$f", "mandatory": true}""").mkString("[", ",", "]")
      Files.createDirectories(Paths.get(mdir))
      Files.writeString(Paths.get(mdir, f"manifest-$batchId%010d.json"),
        s"""{"entries": $entries}""")
    }

    // 3. failed records → errors/ prefix (README.md:426). Batch-scoped
    // subdir + overwrite ⇒ a mid-batch replay REPLACES the attempt instead
    // of appending a duplicate (idempotent per batch).
    cfg.errorDir.foreach { edir =>
      batch.where(!col("__ok"))
        .select(col("partition_key"), col("sequence_number"), col("__raw").as("raw"),
          col("processed_at"), col("year"), col("month"), col("day"), col("hour"))
        .write.mode("overwrite").partitionBy("year", "month", "day", "hour")
        .parquet(s"$edir/batch=$batchId")
    }

    // 4. raw backup (S3BackupMode=AllData, README.md:605) — same idempotence
    cfg.backupDir.foreach { bdir =>
      batch.select(col("partition_key"), col("sequence_number"), col("__raw").as("raw"))
        .write.mode("overwrite").parquet(s"$bdir/batch=$batchId")
    }

    // 5. commit marker — the batch is fully delivered; replays become no-ops
    Files.createDirectories(marker.getParent)
    Files.writeString(marker, "")
  }

  private def parseManifestUrls(json: String): Seq[String] =
    """"url"\s*:\s*"([^"]+)"""".r.findAllMatchIn(json).map(_.group(1)).toVector

  private def listParquet(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Seq.empty
    else {
      val s = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => p.toString.endsWith(".parquet") && !p.toString.contains("_spark_metadata"))
          .map(_.toString).toVector.sorted
      } finally s.close()
    }
  }
}
