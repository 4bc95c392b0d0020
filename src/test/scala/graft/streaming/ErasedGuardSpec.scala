package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSuite
import graft.sources.ShardedLog

/** Erasure tombstones + replay guard (r13 verdict ask #2): a crash-replayed
  * batch that re-delivers a GDPR-erased id must not silently resurrect it —
  * in the delivered lake, the fingerprint dedup index, the embedding
  * near-dup index, or an IVF delta append. Each erase entry point records
  * an `_erased` sidecar; each ingest path probes it.
  */
class ErasedGuardSpec extends SparkSuite {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("value", DoubleType), StructField("ts", TimestampType),
      StructField("event_id", LongType)))),
    StructField("metadata", StructType(Seq(StructField("op", StringType))))))
  private val clock = Some(java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13"))

  private def flatBatch(n: Int) = Deliver.transform(
    ShardedLog.fromEvents(graft.queries.Registry.tbl(spark, sfDir, "events").limit(n)),
    payloadSchema, clock)
    .select(col("partition_key"), col("sequence_number"), col("env.data.*"),
      col("env.metadata.op").as("op"), col("processed_at"),
      col("year"), col("month"), col("day"), col("hour"),
      col("__ok"), col("data").as("__raw"))

  test("ErasedKeys: record/read/fold/clear round-trip, typed keys") {
    val store = tmpDir("graft-ek-")
    assert(ErasedKeys.read(spark, store, "id").isEmpty, "no sidecar yet")
    ErasedKeys.record(spark, store, "id", Seq(1L, 2L).toDF("id"))
    ErasedKeys.record(spark, store, "id", Seq(2L, 3L).toDF("id"))
    assert(ErasedKeys.read(spark, store, "id").get
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
    // two sets fold to one, same contents
    assert(ErasedKeys.fold(spark, store, "id") == 2)
    assert(ErasedKeys.read(spark, store, "id").get
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(ErasedKeys.fold(spark, store, "id") == 0, "already folded")
    // a different key column is an independent sidecar
    ErasedKeys.record(spark, store, "fp", Seq("aa", "bb").toDF("fp"))
    assert(ErasedKeys.read(spark, store, "fp").get
      .as[String].collect().toSet == Set("aa", "bb"))
    assert(ErasedKeys.clear(spark, store, "id"))
    assert(ErasedKeys.read(spark, store, "id").isEmpty)
    assert(ErasedKeys.read(spark, store, "fp").isDefined, "clear is per-key")
  }

  test("Deliver: a crash-replay carrying an erased id is dropped, with audit") {
    val base = tmpDir("graft-ekdlv-")
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck",
      manifestDir = Some(s"$base/manifest"), clock = clock,
      erasedGuardCol = Some("id"))
    val batch = flatBatch(50)
    Deliver.deliverBatch(batch, 0L, cfg)
    val subjects = spark.read.parquet(s"$base/lake")
      .select($"id").distinct().where(pmod($"id", lit(5)) === 0)
    val subjectIds = subjects.as[Long].collect().toSet
    assert(subjectIds.nonEmpty, "fixture: need subjects")
    // a literal key frame for post-erase uses: `subjects` captured the
    // PRE-erase file listing at analysis time, so re-executing it after
    // the rewrite would read retired files
    val subjectKeys = subjectIds.toSeq.toDF("id")
    Erase.eraseKeys(spark, s"$base/lake", "id", subjects,
      manifestDir = Some(s"$base/manifest"))
    // the erase retired files under a path this test already read — drop
    // the session's cached listing before re-reading the directory
    spark.catalog.refreshByPath(s"$base/lake")
    assert(spark.read.parquet(s"$base/lake")
      .where($"id".isin(subjectIds.toSeq: _*)).count() == 0)

    // crash between sink work and checkpoint commit: the marker is lost and
    // the SAME batch replays — pre-guard this silently resurrected the
    // subjects; now they are dropped and receipted
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$base/lake", "_commits", f"${0L}%010d"))
    Deliver.deliverBatch(batch, 0L, cfg)
    spark.catalog.refreshByPath(s"$base/lake")
    // the DIRECTORY view is subject-free (the first attempt's rows were
    // erased, the replay's were guarded); exactly-once row counts are the
    // MANIFEST's contract (the marker-lost replay orphans the first
    // attempt's files for directory readers — ReplaySpec's posture)
    assert(spark.read.parquet(s"$base/lake")
      .where($"id".isin(subjectIds.toSeq: _*)).count() == 0,
      "replay resurrected erased subjects")
    val viaManifest = graft.sources.ManifestReader.read(spark, s"$base/manifest")
    assert(viaManifest.where($"id".isin(subjectIds.toSeq: _*)).count() == 0,
      "manifest serves erased subjects after the replay")
    assert(viaManifest.count() == batch.where($"__ok").count() -
      batch.where($"__ok" && $"id".isin(subjectIds.toSeq: _*)).count(),
      "non-erased rows must all re-deliver exactly once")
    // the drop is receipted for audit
    val receipt = spark.read.parquet(s"$base/lake/_erased/dropped/batch=0")
    assert(receipt.select($"id").distinct().as[Long].collect().toSet
      .subsetOf(subjectIds))
    assert(receipt.count() > 0)

    // fail-loudly mode: the same replay halts the batch instead
    val base2 = tmpDir("graft-ekdlv2-")
    val cfg2 = Deliver.Config(s"$base2/lake", s"$base2/ck", clock = clock,
      erasedGuardCol = Some("id"), erasedGuardFail = true)
    Deliver.deliverBatch(batch, 0L, cfg2)
    Erase.eraseKeys(spark, s"$base2/lake", "id", subjectKeys)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$base2/lake", "_commits", f"${0L}%010d"))
    val ex = intercept[IllegalStateException] {
      Deliver.deliverBatch(batch, 0L, cfg2)
    }
    assert(ex.getMessage.contains("GDPR-erased"), ex.getMessage)
  }

  test("Deliver registry path: a replay cannot resurrect a table's erased subjects") {
    val base = tmpDir("graft-ekreg-")
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck", clock = clock,
      schemas = Map("events" -> payloadSchema), erasedGuardCol = Some("id"))
    val wire = ShardedLog.fromEvents(
      graft.queries.Registry.tbl(spark, sfDir, "events").limit(40))
    Deliver.deliverRegistryBatch(wire, 0L, cfg)
    val tdir = s"$base/lake/table=events"
    val subjects = spark.read.parquet(tdir).select($"id").distinct()
      .where(pmod($"id", lit(5)) === 0)
    val subjectIds = subjects.as[Long].collect().toSet
    assert(subjectIds.nonEmpty)
    // erase the table subdir (the registry-lake erase shape)
    Erase.eraseKeys(spark, tdir, "id", subjectIds.toSeq.toDF("id"))
    spark.catalog.refreshByPath(tdir)
    assert(spark.read.parquet(tdir)
      .where($"id".isin(subjectIds.toSeq: _*)).count() == 0)
    // marker-lost replay of the whole batch
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$base/lake", "_commits", f"${0L}%010d"))
    Deliver.deliverRegistryBatch(wire, 0L, cfg)
    spark.catalog.refreshByPath(tdir)
    assert(spark.read.parquet(tdir)
      .where($"id".isin(subjectIds.toSeq: _*)).count() == 0,
      "registry replay resurrected erased subjects")
    assert(spark.read.parquet(tdir).count() > 0,
      "non-subject rows must re-deliver")
    val receipt = spark.read.parquet(s"$tdir/_erased/dropped/batch=0")
    assert(receipt.select($"id").distinct().as[Long].collect().toSet
      .subsetOf(subjectIds) && receipt.count() > 0)
  }

  test("CorpusIndex: a replayed batch cannot re-index an erased fingerprint") {
    val base = tmpDir("graft-ekfp-")
    val docs = graft.queries.Registry.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(40)
    CorpusIndex.seed(docs, "doc_id", "text", s"$base/index")
    // erase one doc: fingerprints BEFORE the lake (the documented order)
    val victimFps = docs.orderBy("doc_id").limit(1)
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val victimFp = victimFps.as[String].head()
    IndexErase.eraseFingerprints(spark, s"$base/index", victimFps)
    assert(!spark.read.parquet(s"$base/index").select($"fp")
      .as[String].collect().contains(victimFp), "erase must scrub the seed")

    // an at-least-once replay re-delivers the erased doc as a "new" batch
    val src = tmpDir("graft-ekfp-src-")
    graft.queries.Registry.stageOrderedFile(
      docs.orderBy("doc_id").limit(1), src, "b0", 1000000L)
    val q = CorpusIndex.start(
      spark.readStream.schema(docs.schema).parquet(src),
      "doc_id", "text", s"$base/index", s"$base/verdicts", s"$base/ck")
    q.awaitTermination()
    assert(!spark.read.parquet(s"$base/index").select($"fp")
      .as[String].collect().contains(victimFp),
      "replayed batch re-indexed an erased fingerprint")
  }

  test("EmbeddingIndex: a replayed batch cannot re-index or pair an erased id") {
    val base = tmpDir("graft-ekemb-")
    val emb = graft.queries.Registry.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding")).limit(60)
    EmbeddingIndex.seed(emb, "id", "embedding", 64, s"$base/index",
      nTables = 6, bitsPerTable = 3)
    val victims = emb.orderBy("id").limit(3).select($"id")
    val victimIds = victims.as[Long].collect().toSet
    IndexErase.eraseFromEmbeddingIndex(spark, s"$base/index", victims)

    val src = tmpDir("graft-ekemb-src-")
    graft.queries.Registry.stageOrderedFile(
      emb.orderBy("id").limit(5), src, "b0", 1000000L)
    val q = EmbeddingIndex.start(
      spark.readStream.schema(emb.schema).parquet(src),
      "id", "embedding", 64, s"$base/index", s"$base/out", s"$base/ck",
      threshold = 0.5, nTables = 6, bitsPerTable = 3)
    q.awaitTermination()
    val indexed = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$base/index/delta=0").select($"id").as[Long].collect().toSet
    assert(indexed.intersect(victimIds).isEmpty,
      s"replay re-indexed erased ids: ${indexed.intersect(victimIds)}")
    val pairs = spark.read.parquet(s"$base/out/batch=0")
    assert(pairs.where($"id_new".isin(victimIds.toSeq: _*) ||
      $"id_other".isin(victimIds.toSeq: _*)).count() == 0,
      "an erased id appeared in output pairs")
    // the non-erased rows of the replay still indexed
    assert(indexed.nonEmpty)
  }

  test("tombstone sets self-fold: at each erase's record, and at the deliver cadence") {
    val base = tmpDir("graft-ekfold-")
    val cfg = Deliver.Config(s"$base/lake", s"$base/ck", clock = clock,
      erasedGuardCol = Some("id"), manifestCompactEvery = 2)
    Deliver.deliverBatch(flatBatch(20), 0L, cfg)
    def nSets = new java.io.File(s"$base/lake/_erased/key=id").listFiles()
      .count(_.getName.startsWith("set-"))
    // each erase folds right after its record — the listing stays O(1)
    // in erase-request count without waiting for the sink's cadence
    Erase.eraseKeys(spark, s"$base/lake", "id", Seq(-101L).toDF("id"))
    Erase.eraseKeys(spark, s"$base/lake", "id", Seq(-102L).toDF("id"))
    assert(nSets == 1, "record-time folding must keep one set")
    // sets recorded OUT-OF-BAND (no fold) are collapsed by the sink's
    // cadence backstop
    ErasedKeys.record(spark, s"$base/lake", "id", Seq(-103L).toDF("id"))
    ErasedKeys.record(spark, s"$base/lake", "id", Seq(-104L).toDF("id"))
    assert(nSets == 3)
    Deliver.deliverBatch(flatBatch(20), 1L, cfg) // off-cadence: untouched
    assert(nSets == 3)
    Deliver.deliverBatch(flatBatch(20), 2L, cfg) // cadence: folds to one
    assert(nSets == 1)
    assert(ErasedKeys.read(spark, s"$base/lake", "id").get
      .as[Long].collect().toSet == Set(-101L, -102L, -103L, -104L))
    // an EMPTY erase request records nothing (no vacuous guard)
    val store2 = tmpDir("graft-ekempty-")
    ErasedKeys.record(spark, store2, "id", Seq.empty[Long].toDF("id"))
    assert(ErasedKeys.read(spark, store2, "id").isEmpty,
      "an empty record must not arm a vacuous sidecar")
  }

  test("UpsertSink: a replayed CDC batch cannot resurrect an erased key") {
    val base = tmpDir("graft-ekups-")
    val table = s"$base/table"
    def chg(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("id", "v", "op", "seq")
    UpsertSink.applyBatch(chg((1L to 8L).map(i => (i, s"v$i", "U", i))),
      0L, table, "id", "op", Seq("seq"), nBuckets = 4, retainCommits = 3)
    UpsertSink.applyBatch(chg(Seq((1L, "v1b", "U", 100L), (9L, "v9", "U", 101L))),
      1L, table, "id", "op", Seq("seq"), retainCommits = 3)
    UpsertSink.eraseKeys(spark, table, "id", Seq(1L, 2L).toDF("id"))
    spark.catalog.refreshByPath(table)

    // crash-replay: batch 2 carries an erased id, dies before its commit,
    // then replays with the SAME id — pre-guard the replay merged the
    // subject back into the table (and its retained history)
    val b2 = chg(Seq((1L, "boo", "U", 200L), (10L, "v10", "U", 201L)))
    intercept[RuntimeException] {
      UpsertSink.applyBatch(b2, 2L, table, "id", "op", Seq("seq"),
        retainCommits = 3, crashBeforeCommit = true)
    }
    UpsertSink.applyBatch(b2, 2L, table, "id", "op", Seq("seq"),
      retainCommits = 3)
    val latest = UpsertSink.readTable(spark, table).get
    assert(latest.where($"id".isin(1L, 2L)).count() == 0,
      "replay resurrected an erased key in the latest table")
    assert(latest.where($"id" === 10L).count() == 1,
      "non-erased replay rows must still merge")
    // the whole retained history stays subject-free
    UpsertSink.commitHistory(table).foreach { c =>
      val t = UpsertSink.readTableAt(spark, table, c.batchId).get
      assert(t.where($"id".isin(1L, 2L)).count() == 0,
        s"as-of ${c.batchId} serves an erased key")
    }
    // and the BYTES are gone: raw read of every bucket version
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$table/buckets").where($"id".isin(1L, 2L)).count() == 0,
      "an erased key is byte-present in a bucket version")
    // the drop is receipted for audit
    val receipt = spark.read.parquet(s"$table/_erased/dropped/batch=2")
    assert(receipt.select($"id").as[Long].collect().toSet == Set(1L))

    // fail-loudly mode halts the sink instead of dropping
    val ex = intercept[IllegalStateException] {
      UpsertSink.applyBatch(chg(Seq((2L, "boo2", "U", 300L))), 3L, table,
        "id", "op", Seq("seq"), retainCommits = 3, erasedGuardFail = true)
    }
    assert(ex.getMessage.contains("GDPR-erased"), ex.getMessage)
    // opt-out restores the raw merge (and is how a deliberately
    // re-admitted subject re-enters after ErasedKeys.clear)
    assert(ErasedKeys.clear(spark, table, "id"))
    UpsertSink.applyBatch(chg(Seq((2L, "back", "U", 400L))), 3L, table,
      "id", "op", Seq("seq"), retainCommits = 3)
    assert(UpsertSink.readTable(spark, table).get
      .where($"id" === 2L).count() == 1, "cleared tombstone must re-admit")
  }

  test("appendToIvfIndex: erased ids are dropped from a re-delivered append") {
    import graft.operators.Similarity
    val base = tmpDir("graft-ekivf-")
    val emb = graft.queries.Registry.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    Similarity.buildIvfIndex(emb.where($"id" >= 10), s"$base/index", nlist = 8)
    val victims = emb.where($"id" >= 10).orderBy("id").limit(5).select($"id")
    val victimIds = victims.as[Long].collect().toSet
    IndexErase.eraseFromIvfIndex(spark, s"$base/index", victims)
    // upstream re-delivers a slice containing the victims
    Similarity.appendToIvfIndex(
      emb.where($"id" >= 10).orderBy("id").limit(10), s"$base/index", deltaId = 0)
    val deltaIds = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$base/index/deltas").select($"nid").as[Long].collect().toSet
    assert(deltaIds.intersect(victimIds).isEmpty,
      s"append re-indexed erased ids: ${deltaIds.intersect(victimIds)}")
    assert(deltaIds.nonEmpty, "non-erased append rows must land")
    // serve never returns a victim
    val queries = graft.queries.Registry.tbl(spark, sfDir, "embeddings")
      .where($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding")
    val got = Similarity.ivfIndexQuery(queries, s"$base/index", k = 5,
      nprobe = 1000).select($"nid").as[Long].collect().toSet
    assert(got.intersect(victimIds).isEmpty)
  }
}
