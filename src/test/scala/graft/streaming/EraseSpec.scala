package graft.streaming

import graft.SparkSuite

/** Key-erasure invariants: every row for the subject keys is gone, rows of
  * other keys survive bit-exact, and files that never contained a target
  * key are not rewritten (the file-pruned copy-on-write contract).
  */
class EraseSpec extends SparkSuite {
  import spark.implicits._

  private def files(dir: String): Map[String, Long] = {
    // DATA files only (skip _erased/_compact control trees — the
    // tombstone sidecar is metadata, not lake contents)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        f.listFiles().toSeq
          .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
          .flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("erases the subject keys only, rewriting only files that contain them") {
    val base = tmpDir("graft-er-")
    val lake = s"$base/lake"
    // two partition dirs; day=1 gets two files, only one containing user 7
    Seq((7L, "x1", 1), (8L, "y1", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.partitionBy("day").parquet(lake)
    Seq((9L, "z1", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(lake)
    Seq((7L, "x2", 2), (10L, "w1", 2)).toDF("user_id", "v", "day")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(lake)
    val before = files(lake)

    val stats = Erase.eraseKeys(spark, lake, "user_id", Seq(7L, 99L).toDF("user_id"))
    val after = files(lake)

    val got = spark.read.parquet(lake)
      .select($"user_id", $"v", $"day".cast("int")).as[(Long, String, Int)].collect().toSet
    assert(got == Set((8L, "y1", 1), (9L, "z1", 1), (10L, "w1", 2)))
    // the file holding only user 9 was never opened or moved
    val survivors = before.keySet.intersect(after.keySet)
    assert(survivors.exists(_.contains("day=1")),
      "day=1's user-9-only file must survive untouched")
    survivors.foreach(p => assert(before(p) == after(p), s"$p was rewritten"))
    assert(stats.filesBefore == 2, "exactly the two files containing user 7 retired")
  }

  test("erasing a key that empties a file retires the file with no replacement") {
    val base = tmpDir("graft-er2-")
    val lake = s"$base/lake"
    Seq((1L, "a", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.partitionBy("day").parquet(lake)
    Seq((2L, "b", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(lake)
    Erase.eraseKeys(spark, lake, "user_id", Seq(1L).toDF("user_id"))
    val got = spark.read.parquet(lake)
      .select($"user_id").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("no-op when no file contains any subject key") {
    val base = tmpDir("graft-er3-")
    val lake = s"$base/lake"
    Seq((1L, "a", 1)).toDF("user_id", "v", "day")
      .write.partitionBy("day").parquet(lake)
    val before = files(lake)
    val stats = Erase.eraseKeys(spark, lake, "user_id", Seq(42L).toDF("user_id"))
    assert(stats == Compact.Stats(0, 0, 0))
    assert(files(lake) == before)
  }

  test("an erasure touching more files than the cap fails fast, lake untouched") {
    val base = tmpDir("graft-er4-")
    val lake = s"$base/lake"
    // key 1 lives in two files
    Seq((1L, "a", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.partitionBy("day").parquet(lake)
    Seq((1L, "b", 2)).toDF("user_id", "v", "day")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(lake)
    val before = files(lake)
    val e = intercept[IllegalStateException] {
      Erase.eraseKeys(spark, lake, "user_id", Seq(1L).toDF("user_id"),
        maxAffectedFiles = 1)
    }
    assert(e.getMessage.contains("maxAffectedFiles"), e.getMessage)
    // refused BEFORE any rewrite: every file is still in place, unmodified
    assert(files(lake) == before)
    assert(spark.read.parquet(lake).count() == 2)
    // an explicitly raised cap lets the same request through
    val stats = Erase.eraseKeys(spark, lake, "user_id", Seq(1L).toDF("user_id"),
      maxAffectedFiles = 10)
    assert(stats.filesBefore == 2)
    // both files held only key 1 — they retire with no replacement
    assert(files(lake).isEmpty)
  }

  test("everywhere() sequences fingerprints -> indexes -> lake -> upsert history") {
    import org.apache.spark.sql.functions._
    val base = tmpDir("graft-er-everywhere-")
    val docs = graft.queries.Registry.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(40)
    docs.write.parquet(s"$base/lake")
    CorpusIndex.seed(docs, "doc_id", "text", s"$base/fpindex")
    val emb = graft.queries.Registry.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
    graft.operators.Similarity.buildIvfIndex(
      emb.withColumnRenamed("doc_id", "id"), s"$base/ivf", nlist = 4)
    docs.select(col("doc_id").as("id"), col("text").as("payload"),
        lit("I").as("op"), col("doc_id").as("seq"))
      .limit(40).createOrReplaceTempView("ew_changes")
    UpsertSink.applyBatch(spark.table("ew_changes"), 0L, s"$base/table",
      "id", "op", Seq("seq"), nBuckets = 4, retainCommits = 3)

    val subjects = docs.orderBy("doc_id").limit(4).select(col("doc_id"))
    val subjectIds = subjects.as[Long].collect().toSet
    val subjectFps = docs
      .join(subjects, Seq("doc_id"), "left_semi")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .distinct().as[String].collect().toSet

    // ONE call, subjects given as ids only — the orchestrator must compute
    // the fingerprints from the texts BEFORE erasing the lake (the
    // ordering a manual caller could get wrong; reversed, the fps are
    // unrecoverable and stay in the index forever)
    val report = Erase.everywhere(spark, subjectIds.toSeq.toDF("doc_id"),
      lakes = Seq(Erase.LakeTarget(s"$base/lake", "doc_id")),
      indexes = Seq(
        Erase.FingerprintTarget(s"$base/fpindex", s"$base/lake", "doc_id", "text"),
        Erase.IvfTarget(s"$base/ivf")),
      tables = Seq(Erase.UpsertTarget(s"$base/table", "id")))

    // fp index scrubbed EVEN THOUGH the texts are gone from the lake
    val fpsLeft = spark.read.parquet(s"$base/fpindex")
      .select(col("fp")).as[String].collect().toSet
    assert(fpsLeft.intersect(subjectFps).isEmpty,
      "fingerprints survived — the fp erase must run before the lake erase")
    // lake scrubbed
    assert(spark.read.parquet(s"$base/lake")
      .where(col("doc_id").isin(subjectIds.toSeq: _*)).count() == 0)
    // IVF corpus scrubbed
    assert(spark.read.parquet(s"$base/ivf/corpus")
      .where(col("nid").isin(subjectIds.toSeq: _*)).count() == 0)
    // upsert table + its history scrubbed
    UpsertSink.commitHistory(s"$base/table").foreach { c =>
      val at = UpsertSink.readTableAt(spark, s"$base/table", c.batchId).get
      assert(at.where(col("id").isin(subjectIds.toSeq: _*)).count() == 0,
        s"subjects servable as-of ${c.batchId}")
    }
    // tombstones recorded at every store (the replay guard is armed)
    assert(ErasedKeys.read(spark, s"$base/lake", "doc_id").isDefined)
    assert(ErasedKeys.read(spark, s"$base/fpindex", "fp").isDefined)
    assert(ErasedKeys.read(spark, s"$base/ivf", "nid").isDefined)
    assert(ErasedKeys.read(spark, s"$base/table", "id").isDefined)
    // the report covers every target
    assert(report.indexes.size == 2 && report.lakes.size == 1 &&
      report.tables.size == 1)
    assert(report.lakes.head._2.filesBefore > 0)
    // the CERTIFICATE (on by default): every component raw-scanned, zero
    // presence, tombstones armed everywhere
    val cert = report.certificate.get
    assert(cert.clean, s"dirty certificate: ${cert.dirty}")
    assert(cert.rows.map(_.component).toSet == Set(
      s"$base/fpindex", s"$base/ivf/corpus", s"$base/ivf/deltas",
      s"$base/lake", s"$base/table/buckets"))
    assert(cert.rows.forall(_.tombstoned), "every store must be tombstoned")

    // standalone re-verification later (post-erase, no texts left): ids
    // verify the lake/index/table; the fp index takes the captured fps
    val recheck = Erase.verify(spark, subjectIds.toSeq.toDF("doc_id"),
      lakes = Seq(Erase.LakeTarget(s"$base/lake", "doc_id")),
      indexes = Seq(
        Erase.FingerprintTarget(s"$base/fpindex", s"$base/lake", "doc_id", "text"),
        Erase.IvfTarget(s"$base/ivf")),
      tables = Seq(Erase.UpsertTarget(s"$base/table", "id")),
      fps = Some(subjectFps.toSeq.toDF("fp")))
    assert(recheck.clean)
    // a FingerprintTarget with no fps must fail fast, not pass vacuously
    val e = intercept[IllegalArgumentException] {
      Erase.verify(spark, subjectIds.toSeq.toDF("doc_id"), lakes = Nil,
        indexes = Seq(Erase.FingerprintTarget(
          s"$base/fpindex", s"$base/lake", "doc_id", "text")))
    }
    assert(e.getMessage.contains("fingerprints"), e.getMessage)
  }

  test("everywhere() reaches the raw backup and DLQ; a replay cannot restock them") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val base = tmpDir("graft-er-side-")
    val payloadSchema = StructType(Seq(
      StructField("data", StructType(Seq(
        StructField("id", LongType), StructField("status", StringType),
        StructField("value", DoubleType), StructField("ts", TimestampType),
        StructField("event_id", LongType)))),
      StructField("metadata", StructType(Seq(StructField("op", StringType))))))
    val clock = Some(java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13"))
    val events = graft.queries.Registry.tbl(spark, sfDir, "events").limit(40)
    val good = graft.sources.ShardedLog.fromEvents(events)
    // three undecodable records: they land in the DLQ, where the subject is
    // still identifiable by partition key even though the payload is not
    val bad = good.limit(3).withColumn("data", lit("%%%not-base64%%%"))
      .withColumn("sequence_number", concat(lit("bad-"), col("sequence_number")))
    graft.sources.ShardedLog.put(good.unionByName(bad), s"$base/log")
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck",
      errorDir = Some(s"$base/errors"), backupDir = Some(s"$base/backup"),
      trigger = Trigger.AvailableNow(), clock = clock,
      erasedGuardCol = Some("id"))
    Deliver.start(graft.sources.ShardedLog.readStream(spark, s"$base/log"),
      payloadSchema, cfg).awaitTermination()

    // subjects: some decoded ids PLUS ONE of the DLQ'd records' subjects
    // (the others stay: an erase emptying the DLQ entirely is legal, but
    // this test also wants DLQ survivors to prove the rewrite is targeted)
    val badIds = bad.select(col("partition_key")).as[String].collect()
      .map(_.stripPrefix("events-").toLong).toSet
    assert(badIds.size >= 2, s"fixture: need >=2 distinct DLQ subjects, got $badIds")
    val modIds = spark.read.parquet(s"$base/lake").select($"id")
      .where(pmod($"id", lit(5)) === 0).as[Long].collect().toSet
    val subjectIds = (modIds -- badIds + badIds.head).toSeq
    val subjectPks = subjectIds.map(i => s"events-$i")
    val pkeys = subjectPks.toDF("partition_key")
    val isSubj = $"partition_key".isin(subjectPks: _*)
    val backupBefore = spark.read.parquet(s"$base/backup").count()
    val subjBackup = spark.read.parquet(s"$base/backup").where(isSubj).count()
    assert(subjBackup > 0 &&
      spark.read.parquet(s"$base/errors").where(isSubj).count() > 0,
      "fixture: subjects must be present in backup and DLQ")

    val report = Erase.everywhere(spark, subjectIds.toDF("id"),
      lakes = Seq(
        Erase.LakeTarget(s"$base/lake", "id"),
        Erase.LakeTarget(s"$base/backup", "partition_key", keys = Some(pkeys)),
        Erase.LakeTarget(s"$base/errors", "partition_key", keys = Some(pkeys))))
    val cert = report.certificate.get
    assert(cert.clean && cert.rows.size == 3, s"$cert")
    Seq("lake", "backup", "errors").foreach(d =>
      spark.catalog.refreshByPath(s"$base/$d"))
    assert(spark.read.parquet(s"$base/backup").where(isSubj).count() == 0)
    assert(spark.read.parquet(s"$base/backup").count() == backupBefore - subjBackup,
      "non-subject backup rows must survive")
    assert(spark.read.parquet(s"$base/errors").where(isSubj).count() == 0)
    assert(spark.read.parquet(s"$base/errors").count() > 0,
      "non-subject DLQ rows must survive the targeted rewrite")
    assert(spark.read.parquet(s"$base/lake")
      .where($"id".isin(subjectIds: _*)).count() == 0)

    // marker-lost replay: batch dirs are rewritten WHOLE (overwrite) —
    // without write-path probes the replay would restock the backup and
    // DLQ with the subjects' raw bytes
    val batchFrame = Deliver.transform(good.unionByName(bad), payloadSchema, clock)
      .select(col("partition_key"), col("sequence_number"), col("env.data.*"),
        col("env.metadata.op").as("op"), col("processed_at"),
        col("year"), col("month"), col("day"), col("hour"),
        col("__ok"), col("data").as("__raw"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$base/lake", "_commits", f"${0L}%010d"))
    Deliver.deliverBatch(batchFrame, 0L, cfg)
    Seq("lake", "backup", "errors").foreach(d =>
      spark.catalog.refreshByPath(s"$base/$d"))
    assert(spark.read.parquet(s"$base/backup").where(isSubj).count() == 0,
      "replay restocked the raw backup with erased subjects")
    assert(spark.read.parquet(s"$base/errors").where(isSubj).count() == 0,
      "replay restocked the DLQ with erased subjects")
    assert(spark.read.parquet(s"$base/lake")
      .where($"id".isin(subjectIds: _*)).count() == 0)
    assert(spark.read.parquet(s"$base/backup").count() == backupBefore - subjBackup,
      "replay must re-deliver every non-subject backup row")
  }

  test("verify() catches a planted resurrection; everywhere() fails loudly on one") {
    import org.apache.spark.sql.functions._
    val base = tmpDir("graft-er-cert-")
    val lake = s"$base/lake"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("user_id", "v").write.parquet(lake)
    val subjects = Seq(1L).toDF("user_id")
    Erase.eraseKeys(spark, lake, "user_id", subjects)
    assert(Erase.verify(spark, subjects,
      Seq(Erase.LakeTarget(lake, "user_id"))).clean)
    // an unguarded replay lands the subject back as a raw file — the
    // certificate's raw scan must see it even though no manifest lists it
    Seq((1L, "boo")).toDF("user_id", "v").write.mode("append").parquet(lake)
    val cert = Erase.verify(spark, subjects,
      Seq(Erase.LakeTarget(lake, "user_id")))
    assert(!cert.clean && cert.totalHits == 1 &&
      cert.dirty.head.component == lake)
    assert(cert.rows.head.tombstoned, "the tombstone is armed regardless")

    // the same resurrection landing INSIDE everywhere()'s verify window
    // (an unguarded concurrent ingest, post-erase pre-certificate) makes
    // the one-call erase fail loudly instead of reporting success
    Erase.preVerifyTestHook = () =>
      Seq((2L, "boo2")).toDF("user_id", "v").write.mode("append").parquet(lake)
    try {
      val e = intercept[IllegalStateException] {
        Erase.everywhere(spark, Seq(2L).toDF("user_id"),
          lakes = Seq(Erase.LakeTarget(lake, "user_id")))
      }
      assert(e.getMessage.contains("verification FAILED"), e.getMessage)
    } finally { Erase.preVerifyTestHook = () => () }
    // opting out of verification still erases (the pre-r14 behavior)
    val r = Erase.everywhere(spark, Seq(3L).toDF("user_id"),
      lakes = Seq(Erase.LakeTarget(lake, "user_id")), verify = false)
    assert(r.certificate.isEmpty)
  }
}
