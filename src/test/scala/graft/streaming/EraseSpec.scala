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
  }
}
