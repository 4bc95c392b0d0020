package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.queries.Registry
import graft.sources.{ShardedLog, StreamIngest}
import graft.sources.v2.GraftLog

/** The `graftlog` DataSourceV2 MicroBatchStream (r11): SequenceNumber-range
  * offsets, per-shard ordering, byte/count admission, replay positions,
  * reshard pickup, and the Deliver exactly-once contract on the V2 path —
  * the real shape of the reference's S1–S5 consumer (README.md:43-53),
  * replacing the file-stream emulation's split admission surface.
  */
class GraftLogSourceSpec extends SparkSuite {

  private def events = Registry.tbl(spark, sfDir, "events").limit(400)

  private def wire(nShards: Int = 4) = ShardedLog.fromEvents(events, nShards)

  /** Run an AvailableNow pass collecting (batchId, shard, seq) arrival
    * tuples; returns per-batch row counts and the arrival log.
    */
  private def drain(dir: String, ck: String,
      opts: Map[String, String] = Map.empty): Seq[(Long, Seq[(String, String)])] = {
    val log = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[(String, String)])]()
    var r = spark.readStream.format("graftlog")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(dir).writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // collect preserves per-partition order; one shard = one partition,
        // so a shard's rows appear in arrival order
        val rows = batch.select("shard_id", "sequence_number").collect()
          .map(x => (x.getString(0), x.getString(1))).toSeq
        log.add((id, rows)); ()
      }.start()
    q.awaitTermination()
    log.iterator().asScala.toSeq.sortBy(_._1)
  }

  test("round trip: append → stream read returns exactly the input records (batch read too)") {
    val dir = tmpDir("graft-v2log-")
    GraftLog.append(wire(), dir)
    // the log stores canonical (whitespace-free) base64 — normalize the
    // input side the same way for the byte-for-byte comparison
    val in = wire().select(col("shard_id"), col("partition_key"),
      col("sequence_number"), col("approx_arrival_ts"),
      regexp_replace(col("data"), "\\s", "").as("data"))
      .collect().map(_.toSeq).toSet
    val batches = drain(dir, tmpDir("graft-v2ck-"))
    assert(batches.map(_._2.size).sum == in.size)
    // batch read (the replay-audit path) returns the same set, timestamps included
    val back = spark.read.format("graftlog").load(dir)
      .select("shard_id", "partition_key", "sequence_number",
        "approx_arrival_ts", "data").collect().map(_.toSeq).toSet
    assert(back == in)
  }

  test("byte admission splits the pull into budgeted batches; per-shard order holds across them") {
    val dir = tmpDir("graft-v2adm-")
    // small segments so the byte budget bites mid-stream
    GraftLog.append(wire(), dir, maxSegmentBytes = 4096)
    val batches = drain(dir, tmpDir("graft-v2admck-"),
      Map("maxBytesPerTrigger" -> "16384"))
    assert(batches.size > 2, s"expected multiple budgeted batches, got ${batches.size}")
    val total = wire().count()
    assert(batches.map(_._2.size).sum == total)
    // per-shard global arrival order (batch order, then in-batch order)
    // must be sequence order — the reference's per-shard consumer contract
    // batches are sorted by id and flatMap preserves in-batch arrival
    // order, so this IS each shard's global arrival order
    val arrivals = batches.flatMap(_._2)
    arrivals.map(_._1).distinct.foreach { shard =>
      val seqs = arrivals.filter(_._1 == shard).map(_._2)
      assert(seqs == seqs.sorted, s"shard $shard arrived out of sequence order")
    }
    // record-count admission also caps batches
    val recBatches = drain(dir, tmpDir("graft-v2admck2-"),
      Map("maxRecordsPerTrigger" -> "64"))
    assert(recBatches.size > 2)
    assert(recBatches.map(_._2.size).sum == total)
  }

  test("checkpoint resume: a second pull delivers exactly the appended delta, no replays") {
    val dir = tmpDir("graft-v2res-")
    val ck = tmpDir("graft-v2resck-")
    val ev = Registry.tbl(spark, sfDir, "events")
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") < 200)), dir)
    val first = drain(dir, ck)
    val firstSeqs = first.flatMap(_._2).map(_._2).toSet
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") >= 200 && col("event_id") < 300)), dir)
    val second = drain(dir, ck)
    val secondSeqs = second.flatMap(_._2).map(_._2).toSet
    assert(secondSeqs.nonEmpty)
    assert(firstSeqs.intersect(secondSeqs).isEmpty, "resume replayed committed records")
    assert(firstSeqs.size + secondSeqs.size ==
      ev.where(col("event_id") < 300).count())
  }

  test("starting positions: LATEST skips history; AT_SEQUENCE resumes after explicit offsets") {
    val dir = tmpDir("graft-v2pos-")
    val ev = Registry.tbl(spark, sfDir, "events")
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") < 100)), dir)
    // LATEST: history invisible, only post-start appends arrive
    val ckL = tmpDir("graft-v2posck-")
    assert(drain(dir, ckL, Map("startingPosition" -> "LATEST")).flatMap(_._2).isEmpty)
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") >= 100 && col("event_id") < 150)), dir)
    val post = drain(dir, ckL, Map("startingPosition" -> "LATEST"))
    assert(post.map(_._2.size).sum == ev.where(col("event_id") >= 100 && col("event_id") < 150).count())
    // AT_SEQUENCE: an explicit per-shard offset JSON replays from there
    val hw = GraftLog.highWater(new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), dir)
    // start after HALF the shards' high-water: those shards deliver nothing
    // below their offset; unnamed shards deliver from the beginning
    val half = hw.toSeq.sorted.take(hw.size / 2).toMap
    val json = half.toSeq.sorted.map { case (s, q) => s""""$s":"$q"""" }.mkString("{", ",", "}")
    val at = drain(dir, tmpDir("graft-v2posck2-"), Map("startingPosition" -> json))
    val got = at.flatMap(_._2)
    assert(got.nonEmpty)
    half.foreach { case (shard, offset) =>
      assert(got.filter(_._1 == shard).forall(_._2 > offset),
        s"AT_SEQUENCE replayed records at/below the offset for $shard")
    }
  }

  test("reshard: new shard directories appearing mid-stream are picked up from their start") {
    val dir = tmpDir("graft-v2resh-")
    val ck = tmpDir("graft-v2reshck-")
    val ev = Registry.tbl(spark, sfDir, "events")
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") < 100), nShards = 2), dir)
    val first = drain(dir, ck)
    assert(first.flatMap(_._2).map(_._1).toSet.size == 2)
    // scale-out: the producer now routes over 8 shards (6 new directories)
    GraftLog.append(ShardedLog.fromEvents(
      ev.where(col("event_id") >= 100 && col("event_id") < 200), nShards = 8), dir)
    val second = drain(dir, ck)
    assert(second.map(_._2.size).sum ==
      ev.where(col("event_id") >= 100 && col("event_id") < 200).count())
    assert(second.flatMap(_._2).map(_._1).toSet.size > 2, "new shards not picked up")
  }

  test("log-contract violations are refused loudly: non-monotonic append; straddling segment read") {
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    val dir = tmpDir("graft-v2mono-")
    GraftLog.append(wire(), dir)
    // re-appending the same sequence numbers violates per-shard monotonicity
    val ex = intercept[Exception] { GraftLog.append(wire(), dir) }
    assert(messages(ex).exists(_.contains("monotonicity")), messages(ex).mkString(" | "))
    // a hand-forged segment straddling the committed offset is a corrupt
    // log: the reader must refuse, not skip or re-read
    val dir2 = tmpDir("graft-v2corrupt-")
    val ck2 = tmpDir("graft-v2corruptck-")
    val ev = Registry.tbl(spark, sfDir, "events")
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") < 50), nShards = 2), dir2)
    drain(dir2, ck2)
    val fs = new org.apache.hadoop.fs.Path(dir2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shard = GraftLog.listSegments(fs, dir2).keys.head
    val hw = GraftLog.highWater(fs, dir2)(shard)
    val below = (BigInt(hw) - 1).toString.reverse.padTo(hw.length, '0').reverse.mkString
    val above = (BigInt(hw) + 1000).toString.reverse.padTo(hw.length, '0').reverse.mkString
    val forged = new org.apache.hadoop.fs.Path(s"$dir2/$shard",
      s"seg-$below-$above-2-64-${java.util.UUID.randomUUID()}.log")
    val out = fs.create(forged, false)
    out.write(s"s\tk\t$below\t0\tQQ==\ns\tk\t$above\t0\tQQ==\n".getBytes("UTF-8"))
    out.close()
    val ex2 = intercept[Exception] { drain(dir2, ck2) }
    assert(messages(ex2).exists(_.contains("straddles")), messages(ex2).mkString(" | "))
  }

  test("Deliver on the V2 path: exactly-once lake, idempotent re-run, delta-only growth") {
    val dir = tmpDir("graft-v2dlv-")
    val lake = tmpDir("graft-v2dlvlake-")
    val ck = tmpDir("graft-v2dlvck-")
    val ev = Registry.tbl(spark, sfDir, "events")
    val payloadSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("data", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType)))),
      org.apache.spark.sql.types.StructField("metadata", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType))))))
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") < 200)), dir)
    def deliver(): Unit = {
      val q = graft.streaming.Deliver.start(spark,
        StreamIngest.GraftLog(dir, maxBytesPerTrigger = Some(32768)),
        payloadSchema,
        graft.streaming.Deliver.Config(lakeDir = lake, checkpointDir = ck,
          trigger = Trigger.AvailableNow()))
      q.awaitTermination()
    }
    deliver()
    val n1 = spark.read.parquet(lake).count()
    assert(n1 == ev.where(col("event_id") < 200).count())
    // idempotent: nothing new ⇒ nothing written
    deliver()
    assert(spark.read.parquet(lake).count() == n1)
    // delta: exactly the appended records land, none replayed
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") >= 200 && col("event_id") < 260)), dir)
    deliver()
    val after = spark.read.parquet(lake)
    assert(after.count() == ev.where(col("event_id") < 260).count())
    assert(after.select("event_id").distinct().count() == after.count(),
      "V2 delivery produced duplicate events")
  }
}
