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

  test("eraseKeys scrubs the retained log: ranges preserved, untouched segments unmoved, replay clean, append guarded") {
    import spark.implicits._
    val dir = tmpDir("graft-v2erase-")
    val ck = tmpDir("graft-v2eraseck-")
    val ev = Registry.tbl(spark, sfDir, "events")
    val in = ShardedLog.fromEvents(ev.where(col("event_id") < 300))
    GraftLog.append(in, dir, maxSegmentBytes = 4096)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def segLines(path: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val src = scala.io.Source.fromInputStream(fs.open(p), "UTF-8")
      try src.getLines().toVector finally src.close()
    }
    // consumers committed the WHOLE log before the erase
    assert(drain(dir, ck).map(_._2.size).sum == in.count())

    val subjects = in.select(col("partition_key")).distinct()
      .as[String].collect().sorted.take(5).toSet
    val subjectRows = in.where(col("partition_key").isin(subjects.toSeq: _*)).count()
    assert(subjectRows > 0)
    val before = GraftLog.listSegments(fs, dir).values.flatten.toSeq
    val holds = before.filter(s =>
      segLines(s.path).exists(l => subjects(l.split('\t')(1)))).map(_.path).toSet
    assert(holds.nonEmpty && holds.size < before.size,
      "fixture: need both affected and untouched segments")
    val hwBefore = GraftLog.highWater(fs, dir)

    val stats = GraftLog.eraseKeys(spark, dir, subjects.toSeq.toDF("partition_key"))
    assert(stats.segmentsRewritten == holds.size)
    assert(stats.linesErased == subjectRows)
    val after = GraftLog.listSegments(fs, dir).values.flatten.toSeq
    // untouched segments: same path, not rewritten
    assert(before.filterNot(s => holds(s.path)).map(_.path).toSet
      .subsetOf(after.map(_.path).toSet), "an untouched segment was moved")
    // affected segments: old path gone, replacement holds the SAME declared
    // range with subject lines filtered out
    before.filter(s => holds(s.path)).foreach { old =>
      assert(!after.exists(_.path == old.path), s"${old.path} not retired")
      val repl = after.find(s => s.shard == old.shard &&
        s.firstSeq == old.firstSeq && s.lastSeq == old.lastSeq).get
      assert(repl.count < old.count)
      assert(!segLines(repl.path).exists(l => subjects(l.split('\t')(1))))
    }
    assert(GraftLog.highWater(fs, dir) == hwBefore, "erase moved the high water")
    assert(GraftLog.countKeyLines(spark, dir, subjects) == 0L)
    // a TRIM_HORIZON replay (fresh checkpoint) now yields survivors only
    val replay = spark.read.format("graftlog").load(dir)
    assert(replay.where(col("partition_key").isin(subjects.toSeq: _*)).count() == 0)
    assert(replay.count() == in.count() - subjectRows)
    // the COMMITTED consumer continues over the scrubbed log: a fresh
    // append delivers exactly the delta, no straddle, no replays
    GraftLog.append(ShardedLog.fromEvents(
      ev.where(col("event_id") >= 300 && col("event_id") < 350)), dir)
    val delta = drain(dir, ck)
    assert(delta.map(_._2.size).sum ==
      ev.where(col("event_id") >= 300 && col("event_id") < 350)
        .where(!concat(lit("events-"), col("user_id")).isin(subjects.toSeq: _*))
        .count(), "scrubbed log broke the committed consumer's resume")
    // producer re-delivery of the subjects (fresh seqs) is DROPPED by the
    // tombstone guard instead of restocking the log
    val restock = ShardedLog.fromEvents(
      ev.where(col("event_id") < 300)
        .withColumn("event_id", col("event_id") + 10000000L))
      .where(col("partition_key").isin(subjects.toSeq: _*))
    assert(restock.count() > 0)
    GraftLog.append(restock, dir)
    assert(GraftLog.countKeyLines(spark, dir, subjects) == 0L,
      "a producer re-delivery restocked erased subjects")
    // the certificate covers the log tier
    val cert = graft.streaming.Erase.verify(spark,
      subjects.toSeq.toDF("partition_key"), lakes = Nil,
      logs = Seq(graft.streaming.Erase.LogTarget(dir)))
    assert(cert.clean && cert.rows.size == 1 && cert.rows.head.tombstoned)
  }

  test("log erased to emptiness keeps declared ranges: offset math and monotonicity intact") {
    import spark.implicits._
    val dir = tmpDir("graft-v2eraseall-")
    val ev = Registry.tbl(spark, sfDir, "events")
    val in = ShardedLog.fromEvents(ev.where(col("event_id") < 120), nShards = 2)
    GraftLog.append(in, dir, maxSegmentBytes = 2048)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hwBefore = GraftLog.highWater(fs, dir)
    val all = in.select(col("partition_key")).distinct().as[String].collect().toSeq
    GraftLog.eraseKeys(spark, dir, all.toDF("partition_key"))
    assert(GraftLog.highWater(fs, dir) == hwBefore,
      "empty segments must hold their declared ranges")
    assert(spark.read.format("graftlog").load(dir).count() == 0)
    assert(drain(dir, tmpDir("graft-v2eactck-")).map(_._2.size).sum == 0)
    // monotonicity still enforced against the PRESERVED high water: the
    // same sequence numbers cannot be re-appended even after total erasure
    graft.streaming.ErasedKeys.clear(spark, dir, "partition_key")
    val e = intercept[Exception] { GraftLog.append(in, dir) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("monotonicity")), messages(e).mkString("; "))
  }

  test("retention: expireUpTo trims history, preserves high water, committed consumers continue") {
    import spark.implicits._
    val dir = tmpDir("graft-v2exp-")
    val ck = tmpDir("graft-v2expck-")
    val ev = Registry.tbl(spark, sfDir, "events")
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") < 150)),
      dir, maxSegmentBytes = 2048)
    GraftLog.append(ShardedLog.fromEvents(
      ev.where(col("event_id") >= 150 && col("event_id") < 300)),
      dir, maxSegmentBytes = 2048)
    assert(drain(dir, ck).map(_._2.size).sum == 300)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hwBefore = GraftLog.highWater(fs, dir)
    // an UNPADDED watermark would lexically expire the whole log — refused
    val eW = intercept[IllegalArgumentException] {
      GraftLog.expireUpTo(spark, dir, "149")
    }
    assert(eW.getMessage.contains("width"), eW.getMessage)
    assert(spark.read.format("graftlog").load(dir).count() == 300,
      "the refused watermark must not have expired anything")
    val w149 = f"${149L}%030d"
    assert(GraftLog.expireUpTo(spark, dir, w149) > 0)
    // TRIM_HORIZON replay = exactly the surviving slice
    val replay = spark.read.format("graftlog").load(dir)
    assert(replay.count() ==
      ev.where(col("event_id") >= 150 && col("event_id") < 300).count())
    assert(replay.select(col("sequence_number")).as[String]
      .collect().forall(_ > w149))
    assert(GraftLog.highWater(fs, dir) == hwBefore, "expiry moved the high water")
    assert(GraftLog.expireUpTo(spark, dir, w149) == 0, "expiry must be idempotent")
    // TOTAL expiry: 0-count holders keep every shard's high water
    assert(GraftLog.expireUpTo(spark, dir, f"${299L}%030d") > 0)
    assert(spark.read.format("graftlog").load(dir).count() == 0)
    assert(GraftLog.highWater(fs, dir) == hwBefore,
      "total expiry must hold the high water via 0-count range holders")
    // producer monotonicity is intact: recycled sequence numbers refused
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    val e = intercept[Exception] {
      GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") < 150)), dir)
    }
    assert(messages(e).exists(_.contains("monotonicity")), messages(e).mkString("; "))
    // the COMMITTED consumer (offsets past the expired range) continues
    // with exactly the fresh delta
    GraftLog.append(ShardedLog.fromEvents(
      ev.where(col("event_id") >= 300 && col("event_id") < 330)), dir)
    assert(drain(dir, ck).map(_._2.size).sum ==
      ev.where(col("event_id") >= 300 && col("event_id") < 330).count())
  }

  test("append is refused while a maintenance pass is active (no silent range corruption)") {
    val dir = tmpDir("graft-v2applock-")
    val ev = Registry.tbl(spark, sfDir, "events")
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") < 30)), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the marker is provider-independent (a custom LockProvider leaves no
    // _compact/lock file to probe) — simulate a live erase/retention pass
    val marker = new org.apache.hadoop.fs.Path(dir, "_erase/active")
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
    val e = intercept[IllegalStateException] {
      GraftLog.append(ShardedLog.fromEvents(
        ev.where(col("event_id") >= 30 && col("event_id") < 60)), dir)
    }
    assert(e.getMessage.contains("append refused"), e.getMessage)
    fs.delete(marker, false)
    GraftLog.append(ShardedLog.fromEvents(
      ev.where(col("event_id") >= 30 && col("event_id") < 60)), dir)
    assert(spark.read.format("graftlog").load(dir).count() ==
      ev.where(col("event_id") < 60).count())
    // a maintenance pass sweeps and re-arms its own marker, so an erase
    // right after a crashed pass still completes and unlocks appends
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
    import spark.implicits._
    GraftLog.eraseKeys(spark, dir, Seq.empty[String].toDF("partition_key"))
    assert(!fs.exists(marker), "the erase must sweep and release the marker")
    GraftLog.append(ShardedLog.fromEvents(
      ev.where(col("event_id") >= 60 && col("event_id") < 70)), dir)
    assert(spark.read.format("graftlog").load(dir).count() ==
      ev.where(col("event_id") < 70).count())
  }

  test("a crashed log erase recovers: roll back without the replacement, roll forward with it") {
    import spark.implicits._
    val dir = tmpDir("graft-v2erasecrash-")
    val ev = Registry.tbl(spark, sfDir, "events")
    GraftLog.append(ShardedLog.fromEvents(ev.where(col("event_id") < 60), nShards = 1), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seg = GraftLog.listSegments(fs, dir).values.flatten.toSeq.head
    val segPath = new org.apache.hadoop.fs.Path(seg.path)
    val shardDir = segPath.getParent
    val shard = shardDir.getName
    def writeIntent(nw: String): Unit =
      graft.streaming.FsOps.atomicWrite(spark.sessionState.newHadoopConf(), fs,
        new org.apache.hadoop.fs.Path(dir, "_erase/intent"),
        s"$shard\t${segPath.getName}\t.etmp-gone\t$nw".getBytes("UTF-8"))
    // ROLL BACK: crash after the aside, before the replacement landed
    fs.rename(segPath, new org.apache.hadoop.fs.Path(shardDir, s".eretired-${segPath.getName}"))
    writeIntent("seg-x-y-0-0-00000000-0000-0000-0000-000000000000.log")
    GraftLog.eraseKeys(spark, dir, Seq.empty[String].toDF("partition_key"))
    assert(fs.exists(segPath), "roll back must restore the aside")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_erase/intent")))
    assert(spark.read.format("graftlog").load(dir).count() ==
      ev.where(col("event_id") < 60).count())
    // ROLL FORWARD: crash after the replacement landed, aside not yet swept
    val nwName = seg.path.split('/').last.replaceAll(
      "-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\\.log$",
      "-11111111-1111-1111-1111-111111111111.log")
    fs.rename(segPath, new org.apache.hadoop.fs.Path(shardDir, s".eretired-${segPath.getName}"))
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(shardDir, s".eretired-${segPath.getName}"),
      fs, new org.apache.hadoop.fs.Path(shardDir, nwName), false,
      spark.sessionState.newHadoopConf())
    writeIntent(nwName)
    GraftLog.eraseKeys(spark, dir, Seq.empty[String].toDF("partition_key"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(shardDir, s".eretired-${segPath.getName}")),
      "roll forward must sweep the aside")
    assert(fs.exists(new org.apache.hadoop.fs.Path(shardDir, nwName)))
    assert(spark.read.format("graftlog").load(dir).count() ==
      ev.where(col("event_id") < 60).count())
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
