package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.streaming.CorpusIndex

/** Scale-gate tool for the STREAMING DEDUP INDEX: feed N fixed-size
  * batches through [[CorpusIndex.startNear]] and record each micro-batch's
  * wall time as the index grows. The 100 TB contract is that per-batch
  * cost is O(batch + index PROBE) — the probe joins the batch's bands
  * (small, broadcastable) against the accumulated band deltas (map-side
  * scan, no index-side shuffle) — so the curve over a 20× index growth
  * must stay near-flat. A curve that grows with batch NUMBER means the
  * index is being reshuffled or re-verified per batch, which would be a
  * scale-killer long before 100 TB.
  *
  * Batches are equal slices of the scaled documents table, one parquet
  * file per batch consumed with maxFilesPerTrigger=1, so every micro-batch
  * carries the same work and only the index size varies.
  *
  * Usage: runMain graft.tools.IndexSoak [sfDir] [nBatches] [batchSize]
  */
object IndexSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val batchSize = if (args.length > 2) args(2).toInt else 25000
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

    val base = java.nio.file.Files.createTempDirectory("graft-idxsoak-").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(nBatches * batchSize)
      .withColumn("__b", floor((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))) - 1)
        / batchSize).cast("int"))

    // one parquet FILE per batch so maxFilesPerTrigger=1 maps one batch to
    // one micro-batch; rename the part file out of its directory
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val srcDir = s"$base/src"; fs.mkdirs(new org.apache.hadoop.fs.Path(srcDir))
    (0 until nBatches).foreach { i =>
      val stage = s"$base/stage_$i"
      docs.where(col("__b") === i).drop("__b").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(f"$srcDir/b$i%04d.parquet"))
      ()
    }

    val durations = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) {
          durations.put(p.batchId,
            (p.durationMs.getOrDefault("triggerExecution", -1L), p.numInputRows))
          ()
        }
      }
    })

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = CorpusIndex.startNear(stream, "doc_id", "text",
      s"$base/index", s"$base/out", s"$base/ck")
    q.awaitTermination()
    // listener events are delivered async; drain before reading
    Thread.sleep(2000)

    val rows = durations.entrySet().toArray
      .map(_.asInstanceOf[java.util.Map.Entry[Long, (Long, Long)]])
      .map(e => (e.getKey, e.getValue._1, e.getValue._2)).sortBy(_._1)
    rows.foreach { case (b, ms, n) =>
      println(f"BATCH $b%3d  rows=$n%7d  ${ms / 1000.0}%6.2f s")
    }
    val secs = rows.map(_._2 / 1000.0)
    if (secs.length >= 8) {
      // baseline on batches 2–4, not 0–2: the first micro-batches carry
      // JVM/codegen/state-store cold-start cost, which inflates the
      // denominator and biases growth_ratio toward flat (round-8 advice —
      // DeliverScale warms explicitly; a streaming query can't, so skip
      // the cold batches instead)
      val baseline = secs.slice(2, 5).sum / 3
      val last3 = secs.takeRight(3).sum / 3
      println(f"""{"n_batches":${rows.length},"batch_size":$batchSize,""" +
        f""""baseline_b2_4_avg_s":$baseline%.2f,"last3_avg_s":$last3%.2f,""" +
        f""""growth_ratio":${last3 / baseline}%.2f}""")
    } else if (secs.length >= 6) {
      // too few batches for the cold-start-free baseline: still emit a
      // summary (a 6-7 batch run previously produced one — never drop the
      // JSON silently) but flag that batches 0-2 include warm-up
      val baseline = secs.take(3).sum / 3
      val last3 = secs.takeRight(3).sum / 3
      println(f"""{"n_batches":${rows.length},"batch_size":$batchSize,""" +
        f""""baseline_b0_2_avg_s":$baseline%.2f,"last3_avg_s":$last3%.2f,""" +
        f""""growth_ratio":${last3 / baseline}%.2f,"cold_start_in_baseline":true}""")
    } else {
      System.err.println(s"[indexsoak] only ${secs.length} measured batches — " +
        "need >= 6 for a growth summary (>= 8 for the cold-start-free baseline)")
    }
    spark.stop()
  }
}
