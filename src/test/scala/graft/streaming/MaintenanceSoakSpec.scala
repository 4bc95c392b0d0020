package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSuite
import graft.sources.{ManifestReader, ShardedLog}

/** Maintenance-under-ingest soak (VERDICT r7 ask #5): the reference's
  * zero-lost / zero-duplicate delivery invariant (README.md:204) must hold
  * THROUGH maintenance, not just in isolation — N delivery batches
  * interleaved with Compact.run and a Retention sweep against the same
  * lake, plus a phase where compaction folds the manifest chain WHILE a
  * live delivery pass is committing micro-batches. After every step, a
  * manifest reader must see exactly the committed, non-retired records,
  * each exactly once.
  *
  * This spec is what motivated two ordering fixes in [[Compact.finish]]:
  * the fold now lands BEFORE olds are physically deleted (a racing
  * manifest reader never resolves a chain naming retired files), and the
  * folded snapshot takes id = max-folded (not max+1, which a live
  * writer's next incremental would collide with — chainFiles would then
  * drop that committed batch from the manifest view).
  */
class MaintenanceSoakSpec extends SparkSuite {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("value", DoubleType), StructField("ts", TimestampType),
      StructField("event_id", LongType)))),
    StructField("metadata", StructType(Seq(StructField("op", StringType))))))

  private val clock = Some(java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13"))

  test("manifest readers see every committed record exactly once through compaction and retention") {
    val base = tmpDir("graft-soak-")
    val all = graft.queries.Registry.tbl(spark, sfDir, "events")
      .where($"event_id" < 600)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .cache()
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck",
      manifestDir = Some(s"$base/manifest"),
      trigger = Trigger.AvailableNow(), clock = clock)

    def stage(lo: Long, hi: Long): Unit =
      ShardedLog.put(ShardedLog.fromEvents(
        graft.queries.Registry.tbl(spark, sfDir, "events")
          .where($"event_id" >= lo && $"event_id" < hi)), s"$base/log")
    def deliver(lo: Long, hi: Long): Unit = {
      stage(lo, hi)
      Deliver.start(ShardedLog.readStream(spark, s"$base/log"), payloadSchema, cfg)
        .awaitTermination()
    }

    // ids retired by the retention sweep (set at sweep time: retention is
    // a point-in-time sweep, not a standing filter — records re-delivered
    // into old partitions afterwards must stay visible)
    var retired = Set.empty[Long]
    def manifestIds(): Seq[Long] =
      ManifestReader.read(spark, s"$base/manifest")
        .select($"event_id").as[Long].collect().toSeq
    def assertExactlyOnce(hi: Long, label: String): Unit = {
      val got = manifestIds()
      assert(got.size == got.distinct.size, s"$label: duplicates via manifest")
      val expected = all.where($"event_id" < hi).select($"event_id").as[Long]
        .collect().filterNot(retired).sorted.toSeq
      assert(got.sorted == expected,
        s"$label: lost=${(expected.toSet -- got).size} extra=${(got.toSet -- expected).size}")
    }

    // ---- interleaved phase: deliveries alternating with maintenance
    deliver(0, 100);   assertExactlyOnce(100, "after delivery 1")
    deliver(100, 200); assertExactlyOnce(200, "after delivery 2")
    val s1 = Compact.run(spark, s"$base/lake", manifestDir = Some(s"$base/manifest"))
    assertExactlyOnce(200, s"after compact 1 (packed ${s1.partitionsPacked})")
    deliver(200, 300); assertExactlyOnce(300, "after delivery 3")

    // retention: drop every hour partition strictly before Jan 8 (the sf
    // events span 2024-01-01..01-30, so this retires a real prefix)
    val cutoff = java.time.LocalDateTime.of(2024, 1, 8, 0, 0)
    val cutTs = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    val swept = Retention.sweep(spark, s"$base/lake", cutoff, Some(s"$base/manifest"))
    retired = all.where($"event_id" < 300 && $"ts" < lit(cutTs))
      .select($"event_id").as[Long].collect().toSet
    assert(swept.partitionsPacked > 0 && retired.nonEmpty, "sweep must drop real partitions")
    assertExactlyOnce(300, "after retention")

    // records whose event time predates the horizon are still DELIVERABLE
    // afterwards (sweep ≠ filter) — they recreate old partitions and count
    deliver(300, 400); assertExactlyOnce(400, "after delivery 4 (pre-horizon ts included)")
    Compact.run(spark, s"$base/lake", manifestDir = Some(s"$base/manifest"))
    assertExactlyOnce(400, "after compact 2")

    // ---- live-overlap phase: a delivery pass committing one staged file
    // per micro-batch while compaction folds the manifest chain mid-flight
    (400L until 600L by 40L).foreach(lo => stage(lo, lo + 40))
    val live = Deliver.start(
      ShardedLog.readStream(spark, s"$base/log", maxFilesPerTrigger = Some(1)),
      payloadSchema, cfg)
    var folds = 0
    var prev = Set.empty[Long]
    while (live.isActive && folds < 8) {
      Thread.sleep(300)
      val s = Compact.run(spark, s"$base/lake", manifestDir = Some(s"$base/manifest"))
      if (s.partitionsPacked > 0) folds += 1
      // mid-flight reads: never a duplicate, never a vanished record
      val ids = manifestIds()
      assert(ids.size == ids.distinct.size, "mid-soak: duplicates via manifest")
      val now = ids.toSet
      assert(prev.subsetOf(now ++ retired),
        s"mid-soak: ${(prev -- now -- retired).size} committed records vanished")
      prev = now
    }
    live.awaitTermination()
    assert(folds > 0, "the soak must observe at least one fold under live ingest")
    assertExactlyOnce(600, "after live overlap")

    all.unpersist()
    ()
  }

  test("exactly-once holds on a DOUBLE-GRADUATED lake: pq manifest + pq zones, self-folding under live ingest racing Compact") {
    // r13 integration capstone: manifestCompactEvery=1 makes EVERY live
    // micro-batch a cadence batch — the stream self-folds the parquet
    // manifest (under the try-lock, deferring to Compact's held lock) and
    // the parquet zone sidecar, while Compact folds its retire/promote
    // edits in-tier and mid-flight manifest readers must never see a
    // duplicate, a vanished record, or a partial chain (the aside window).
    val base = tmpDir("graft-soak3-")
    val all = graft.queries.Registry.tbl(spark, sfDir, "events")
      .where($"event_id" < 600)
      .select($"event_id", $"ts").cache()
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck",
      manifestDir = Some(s"$base/manifest"),
      zoneMapCols = Seq("ts", "event_id"),
      manifestCompactEvery = 1,
      trigger = Trigger.AvailableNow(), clock = clock)
    def stage(lo: Long, hi: Long): Unit =
      ShardedLog.put(ShardedLog.fromEvents(
        graft.queries.Registry.tbl(spark, sfDir, "events")
          .where($"event_id" >= lo && $"event_id" < hi)), s"$base/log")
    def manifestIds(): Seq[Long] =
      ManifestReader.read(spark, s"$base/manifest")
        .select($"event_id").as[Long].collect().toSeq
    def assertExactlyOnce(hi: Long, label: String): Unit = {
      val got = manifestIds()
      assert(got.size == got.distinct.size, s"$label: duplicates via manifest")
      val expected = all.where($"event_id" < hi).select($"event_id").as[Long]
        .collect().sorted.toSeq
      assert(got.sorted == expected,
        s"$label: lost=${(expected.toSet -- got).size} extra=${(got.toSet -- expected).size}")
    }

    stage(0, 200)
    Deliver.start(ShardedLog.readStream(spark, s"$base/log"), payloadSchema, cfg)
      .awaitTermination()
    // graduate BOTH tiers
    graft.sources.ZoneMaps.foldToParquet(spark, s"$base/manifest")
    ManifestReader.foldManifestToParquet(spark, s"$base/manifest")
    val mfs = new org.apache.hadoop.fs.Path(s"$base/manifest")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(ManifestChain.isParquetTier(mfs,
      new org.apache.hadoop.fs.Path(s"$base/manifest")))
    assertExactlyOnce(200, "after graduation")

    // live overlap: every micro-batch self-folds both tiers; Compact races
    (200L until 600L by 40L).foreach(lo => stage(lo, lo + 40))
    val live = Deliver.start(
      ShardedLog.readStream(spark, s"$base/log", maxFilesPerTrigger = Some(1)),
      payloadSchema, cfg)
    var compacts = 0
    var prev = Set.empty[Long]
    while (live.isActive && compacts < 6) {
      Thread.sleep(250)
      // the lock is fail-fast by contract; a stream self-fold holding it
      // is ordinary contention — retry next round, like any scheduler
      val s = try Compact.run(spark, s"$base/lake",
          manifestDir = Some(s"$base/manifest"))
        catch { case e: IllegalStateException
            if e.getMessage.startsWith("another maintenance writer holds") =>
          Compact.Stats(0, 0, 0)
        }
      if (s.partitionsPacked > 0) compacts += 1
      val ids = manifestIds()
      assert(ids.size == ids.distinct.size, "mid-soak: duplicates via manifest")
      val now = ids.toSet
      assert(prev.subsetOf(now),
        s"mid-soak: ${(prev -- now).size} committed records vanished")
      prev = now
    }
    live.awaitTermination()
    assert(compacts > 0, "the soak must land at least one in-tier compaction")
    assertExactlyOnce(600, "after live overlap")
    // both chains stayed in their parquet tiers — no JSON fold reappeared
    val names = mfs.listStatus(new org.apache.hadoop.fs.Path(s"$base/manifest"))
      .map(_.getPath.getName).toSeq
    assert(!names.exists(_.endsWith(".snap.json")),
      s"a JSON manifest snapshot reappeared post-graduation: $names")
    assert(graft.sources.ZoneMaps.isParquetTier(
      spark.sessionState.newHadoopConf(), s"$base/manifest"))
    // zone pruning stays correct end-to-end on the double-tier lake
    val cut = all.agg(expr("percentile_approx(ts, 0.8)")).head.getTimestamp(0)
    val pred = $"ts" >= lit(cut)
    val a = ManifestReader.readWhere(spark, s"$base/manifest", pred)
      .agg(count(lit(1)), sum($"event_id")).head
    val b = ManifestReader.read(spark, s"$base/manifest").where(pred)
      .agg(count(lit(1)), sum($"event_id")).head
    assert(a == b, s"double-tier readWhere diverged: $a vs $b")
    all.unpersist()
    ()
  }

  test("backfill and erase hold zero-lost/zero-dup through live ingest") {
    // Round-9 extension (VERDICT r8 ask #4): Backfill's dynamic-partition
    // overwrite and Erase's copy-on-write rewrite share Compact's
    // two-phase protocol but have their own manifest-fold interactions —
    // soak them against a live Deliver committing micro-batches.
    //
    // Race discipline: backfill targets a QUIESCED partition (hour
    // 2024-01-06 02:00 = event_ids 166-170, all delivered in the static
    // phase; live ids >= 300 land in later days — the sf events' ids are
    // time-correlated). That mirrors the production runbook: "replace
    // partition contents" is only well-defined for partitions no longer
    // receiving data; a racing append into a repaired partition is
    // overwritten BY DESIGN (dynamic-partition-overwrite semantics).
    // Erase keys are likewise already-delivered ids the live stream never
    // re-sends. The live stream's own commits race both operators' lake
    // listing, lock, and manifest folds — that's the interaction under
    // test.
    val base = tmpDir("graft-soak2-")
    val all = graft.queries.Registry.tbl(spark, sfDir, "events")
      .where($"event_id" < 600)
      .select($"event_id", $"ts").cache()
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck",
      manifestDir = Some(s"$base/manifest"),
      trigger = Trigger.AvailableNow(), clock = clock)
    def stage(lo: Long, hi: Long): Unit =
      ShardedLog.put(ShardedLog.fromEvents(
        graft.queries.Registry.tbl(spark, sfDir, "events")
          .where($"event_id" >= lo && $"event_id" < hi)), s"$base/log")
    def deliver(lo: Long, hi: Long): Unit = {
      stage(lo, hi)
      Deliver.start(ShardedLog.readStream(spark, s"$base/log"), payloadSchema, cfg)
        .awaitTermination()
    }
    val erasedIds = Set(10L, 20L, 30L)
    val droppedIds = Set(170L)
    def manifestRows() = ManifestReader.read(spark, s"$base/manifest")
    def assertState(hi: Long, gone: Set[Long], label: String): Unit = {
      val got = manifestRows().select($"event_id").as[Long].collect().toSeq
      assert(got.size == got.distinct.size, s"$label: duplicates via manifest")
      val expected = all.where($"event_id" < hi).select($"event_id").as[Long]
        .collect().filterNot(gone).sorted.toSeq
      assert(got.sorted == expected,
        s"$label: lost=${(expected.toSet -- got).size} extra=${(got.toSet -- expected).size}")
    }

    // static phase: land ids 0-300, then snapshot the repair input
    deliver(0, 300)
    assertState(300, Set.empty, "after static deliveries")
    // the repair: hour 2024-01-06 02:00 rewritten with status REPAIRED and
    // id 170 dropped — snapshot NOW (localCheckpoint) so mid-soak re-runs
    // replay the same repair instead of re-reading a lake being repaired
    val partFilter = $"year" === 2024 && $"month" === 1 && $"day" === 6 && $"hour" === 2
    val repaired = spark.read.parquet(s"$base/lake").where(partFilter)
      .where(!$"event_id".isin(droppedIds.toSeq: _*))
      .withColumn("status", lit("REPAIRED"))
      .localCheckpoint()
    assert(repaired.count() == 4, "fixture drift: expected ids 166-169 in the hour")
    val partCols = Seq("year", "month", "day", "hour")

    // live phase: ids 300-600 commit one staged file per micro-batch while
    // backfill and erase run against the same lake + manifest chain
    (300L until 600L by 50L).foreach(lo => stage(lo, lo + 50))
    val live = Deliver.start(
      ShardedLog.readStream(spark, s"$base/log", maxFilesPerTrigger = Some(1)),
      payloadSchema, cfg)
    var backfills = 0
    var erases = 0
    var prev = Set.empty[Long]
    // first-iteration unconditionally: on a fast machine the 6-microbatch
    // AvailableNow stream can drain before the first isActive check, and a
    // zero-iteration loop would fail the backfills>0/erases>0 asserts with
    // no product defect behind it (both ops are valid on the quiet lake)
    var first = true
    while (first || (live.isActive && (backfills < 3 || erases < 3))) {
      first = false
      val s = Backfill.overwritePartitions(repaired, s"$base/lake", partCols,
        manifestDir = Some(s"$base/manifest"))
      if (s.partitionsPacked > 0) backfills += 1
      val e = Erase.eraseKeys(spark, s"$base/lake", "event_id",
        erasedIds.toSeq.toDF("event_id"), Some(s"$base/manifest"))
      if (e.filesBefore > 0) erases += 1
      // mid-flight: never a duplicate, never a vanished record beyond the
      // ones maintenance deliberately removed
      val ids = manifestRows().select($"event_id").as[Long].collect().toSeq
      assert(ids.size == ids.distinct.size, "mid-soak: duplicates via manifest")
      val now = ids.toSet
      assert(prev.subsetOf(now ++ erasedIds ++ droppedIds),
        s"mid-soak: ${(prev -- now -- erasedIds -- droppedIds).size} committed records vanished")
      prev = now
    }
    live.awaitTermination()
    assert(backfills > 0, "the soak must land at least one backfill under live ingest")
    assert(erases > 0, "the soak must land at least one erase under live ingest")
    // converged end state: every delivered id exactly once, minus the
    // erased keys and the backfill-dropped record; the repaired rows carry
    // the repair
    assertState(600, erasedIds ++ droppedIds, "after live overlap")
    val repairedStatuses = manifestRows().where($"event_id".isin(166L, 167L, 168L, 169L))
      .select($"status").as[String].collect().toSeq
    assert(repairedStatuses.size == 4 && repairedStatuses.forall(_ == "REPAIRED"),
      "backfilled rows must carry the repaired payload")
    // idempotent convergence: re-running both maintenance ops on the quiet
    // lake is a no-op
    val s2 = Erase.eraseKeys(spark, s"$base/lake", "event_id",
      erasedIds.toSeq.toDF("event_id"), Some(s"$base/manifest"))
    assert(s2.filesBefore == 0, "erase must converge (no affected files on re-run)")
    assertState(600, erasedIds ++ droppedIds, "after idempotent re-run")

    all.unpersist()
    ()
  }
}
