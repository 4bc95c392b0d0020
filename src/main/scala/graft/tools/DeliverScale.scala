package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.Registry

/** Scale-gate tool for the STREAMING arm: measure the deliver path
  * (sharded-log read → envelope decode → partitioned parquet + manifest
  * commit + compaction) at 1× / 10× / 100× the reference's 2.79 MB flush
  * (README.md:359 — the one baseline-comparable segment). The dedup/ANN/
  * graph families have measured sf10/sf20 points in SCALING.md; this
  * gives the deliver path its own batch-size curve so the "buffer knobs
  * trade latency for cost, throughput holds" claim is measured, not
  * argued.
  *
  * The wire batch is replicated deterministically from the events table
  * (event_id offset per copy keeps sequence numbers unique; user_id is
  * untouched so per-key ordering still exercises the shard-hash path).
  * Shard count scales with batch bytes (4 / 8 / 32) mirroring the
  * reference's on-demand resharding under load (README.md:36,74) — a
  * bigger flush arrives over more shards, which is exactly the
  * parallelism a cluster would see.
  *
  * Usage: runMain graft.tools.DeliverScale [sfDir] [runs]
  */
object DeliverScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val payloadSchema = StructType(Seq(
      StructField("data", StructType(Seq(
        StructField("id", LongType), StructField("status", StringType),
        StructField("value", DoubleType), StructField("ts", TimestampType),
        StructField("event_id", LongType)))),
      StructField("metadata", StructType(Seq(StructField("op", StringType))))))

    val events = Registry.tbl(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("value"), col("ts"), col("event_id"))
      .localCheckpoint()
    val nAvail = events.count()
    val avgLen = graft.sources.ShardedLog.fromEvents(events.limit(1000))
      .agg(avg(length(col("data")))).head().getDouble(0)

    def wireBatch(targetBytes: Double, nShards: Int) = {
      val n = math.ceil(targetBytes / avgLen).toLong
      val copies = ((n + nAvail - 1) / nAvail).toInt
      val src =
        if (copies <= 1) events.limit(n.toInt)
        else spark.range(copies).crossJoin(events)
          .withColumn("event_id", col("event_id") + col("id") * 1000000000000L)
          .drop("id").limit(n.toInt)
      (graft.sources.ShardedLog.fromEvents(src, nShards = nShards), n)
    }

    def deliverOnce(log: String, out: String): Double = {
      val t0 = System.nanoTime()
      val q = graft.streaming.Deliver.start(
        graft.sources.ShardedLog.readStream(spark, log), payloadSchema,
        graft.streaming.Deliver.Config(s"$out/lake", s"$out/ck", compact = true,
          partitionByProcessingTime = true,
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    val base = java.nio.file.Files.createTempDirectory("graft-dlvscale-").toString
    // warm the streaming machinery once (state stores, codegen, committers)
    graft.sources.ShardedLog.put(
      graft.sources.ShardedLog.fromEvents(events.limit(100)), s"$base/warmlog")
    deliverOnce(s"$base/warmlog", s"$base/warm")

    val sizes = Seq(("x1", 2.79e6, 4), ("x10", 2.79e7, 8), ("x100", 2.79e8, 32))
    val out = sizes.map { case (label, bytes, shards) =>
      val (wire, n) = wireBatch(bytes, shards)
      graft.sources.ShardedLog.put(wire, s"$base/log_$label")
      // throughput denominator = ACTUAL wire bytes as written to the log,
      // not the nominal target: the record count derives from a 1000-row
      // sample average, so the realized batch can drift from the target
      // (and x1's limit() truncation is otherwise unaccounted) — round-8
      // advice
      val actualBytes = spark.read.parquet(s"$base/log_$label")
        .agg(sum(length(col("data")))).head().getLong(0)
      val times = (1 to runs).map { i =>
        deliverOnce(s"$base/log_$label", s"$base/out_${label}_$i")
      }
      val med = times.sorted.apply(times.size / 2)
      val mbps = actualBytes / 1048576.0 / med
      println(f"DELIVER $label%-5s records=$n%8d shards=$shards%2d bytes=$actualBytes%10d median=$med%7.2f s  ${mbps}%7.1f MB/s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
      s""""$label":{"records":$n,"shards":$shards,"wire_bytes":$actualBytes,"median_s":$med,"mb_per_s":$mbps}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
