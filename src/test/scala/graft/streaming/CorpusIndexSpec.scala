package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSuite

class CorpusIndexSpec extends SparkSuite {
  import spark.implicits._

  /** Write rows as ONE parquet file `<dir>/<name>.parquet` with a pinned
    * mtime so the file stream processes batches in a deterministic order.
    */
  private def stageFile(rows: Seq[(Long, String)], dir: String, name: String,
      mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("graft-ci-stage-").toString
    rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(dir))
    Files.move(part.toPath, Paths.get(dir, s"$name.parquet"))
    Files.setLastModifiedTime(Paths.get(dir, s"$name.parquet"), FileTime.fromMillis(mtime))
  }

  private def runStream(srcDir: String, base: String, ck: String): Unit = {
    val docs = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val q = CorpusIndex.start(docs, "doc_id", "text",
      s"$base/index", s"$base/verdicts", ck, Trigger.AvailableNow())
    q.awaitTermination()
  }

  test("batches classify against the accumulating index in arrival order") {
    val base = Files.createTempDirectory("graft-ci-").toString
    val src = s"$base/src"
    val t0 = System.currentTimeMillis() - 60000
    CorpusIndex.seed(Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/index")
    stageFile(Seq((10L, "alpha"), (11L, "gamma")), src, "b0", t0)          // known, new
    stageFile(Seq((20L, "gamma"), (21L, "delta"), (22L, "delta")), src, "b1", t0 + 2000)
    runStream(src, base, s"$base/ck")

    val got = spark.read.parquet(s"$base/verdicts")
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(got === Map(
      10L -> "known_dup", // alpha seeded
      11L -> "new",       // gamma first seen in b0
      20L -> "known_dup", // gamma known from b0's delta
      21L -> "new",       // delta keeper in b1
      22L -> "batch_dup"))
    // index now holds exactly the distinct fingerprints ever seen
    val idx = spark.read.schema("fp string, delta long").parquet(s"$base/index")
    assert(idx.select($"fp").distinct().count() === 4) // alpha beta gamma delta
  }

  test("replaying the stream is idempotent: deltas overwrite, never double-append") {
    val base = Files.createTempDirectory("graft-ci-").toString
    val src = s"$base/src"
    val t0 = System.currentTimeMillis() - 60000
    CorpusIndex.seed(Seq((1L, "alpha")).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/index")
    stageFile(Seq((10L, "alpha"), (11L, "gamma")), src, "b0", t0)
    stageFile(Seq((20L, "gamma")), src, "b1", t0 + 2000)
    runStream(src, base, s"$base/ck1")
    val before = spark.read.schema("fp string, delta long")
      .parquet(s"$base/index").collect().toSet
    // crash-and-lose-the-checkpoint: the whole stream replays with the
    // same batch ids against the existing index/verdict dirs
    runStream(src, base, s"$base/ck2")
    val after = spark.read.schema("fp string, delta long")
      .parquet(s"$base/index").collect().toSet
    assert(after === before)
    // and verdicts are unchanged too — batch 0 must NOT classify gamma as
    // known_dup from its own prior delta (self-delta is excluded)
    val got = spark.read.parquet(s"$base/verdicts")
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(got(11L) === "new" && got(20L) === "known_dup")
  }

  test("near-dup stream pairs each batch against seed, earlier batches, and itself") {
    val base = Files.createTempDirectory("graft-ci-").toString
    val src = s"$base/src"
    val t0 = System.currentTimeMillis() - 60000
    def words(seed: String) = (1 to 30).map(i => s"$seed$i").mkString(" ")
    val seedText = words("alpha")
    CorpusIndex.seedNear(Seq((1L, seedText)).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/index")
    // b0: near-variant of the seed + an unrelated doc
    stageFile(Seq((10L, seedText + " tail"), (11L, words("beta"))), src, "b0", t0)
    // b1: near-variant of b0's beta + two in-batch near-variants of gamma
    stageFile(Seq((20L, words("beta") + " tail"),
      (21L, words("gamma")), (22L, words("gamma") + " tail")), src, "b1", t0 + 2000)
    val docs = spark.readStream.schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = CorpusIndex.startNear(docs, "doc_id", "text",
      s"$base/index", s"$base/pairs", s"$base/ck")
    q.awaitTermination()
    val got = spark.read.schema("id_new long, id_other long, jaccard double, batch long")
      .parquet(s"$base/pairs")
      .select($"id_new", $"id_other").as[(Long, Long)].collect().toSet
    assert(got === Set(
      (10L, 1L),   // batch 0 vs seed
      (20L, 11L),  // batch 1 vs batch 0's delta
      (22L, 21L))) // within batch 1, smaller id is the "other"
  }

  test("near-dup index persists its MinHash geometry; startNear refuses a mismatch") {
    // band signatures from a different k/banding never match the index's —
    // a mismatched stream would run green while detecting nothing (the
    // EmbeddingIndex/PqIndex silent-recall-loss discipline, lexical form)
    val base = tmpDir("graft-ci-geom-")
    def words(seed: String) = (1 to 30).map(i => s"$seed$i").mkString(" ")
    CorpusIndex.seedNear(Seq((1L, words("alpha"))).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/index", k = 16, rowsPerBand = 2)
    assert(CorpusIndex.readNearGeometry(spark, s"$base/index").contains((16, 2)))
    // the _geometry row must not leak into the band/array delta reads
    assert(spark.read.parquet(s"$base/index/bands").columns.contains("delta"))
    val src = s"$base/src"
    stageFile(Seq((10L, words("alpha") + " tail")), src, "b0",
      System.currentTimeMillis() - 60000)
    val docs = spark.readStream.schema("doc_id long, text string").parquet(src)
    val ex = intercept[IllegalArgumentException] {
      CorpusIndex.startNear(docs, "doc_id", "text",
        s"$base/index", s"$base/pairs", s"$base/ck", k = 32, rowsPerBand = 4)
    }
    assert(ex.getMessage.contains("geometry"))
    // matched geometry streams and finds the seed pair
    CorpusIndex.startNear(docs, "doc_id", "text",
      s"$base/index", s"$base/pairs", s"$base/ck").awaitTermination()
    val got = spark.read.schema("id_new long, id_other long, jaccard double, batch long")
      .parquet(s"$base/pairs").select($"id_new", $"id_other").as[(Long, Long)]
      .collect().toSet
    assert(got == Set((10L, 1L)))
    // re-seeding over the streamed delta must refuse (geometry would change
    // under the accumulated bands)
    val reseed = intercept[IllegalArgumentException] {
      CorpusIndex.seedNear(Seq((2L, words("delta"))).toDF("doc_id", "text"),
        "doc_id", "text", s"$base/index", k = 32, rowsPerBand = 4)
    }
    assert(reseed.getMessage.contains("streaming delta"))
    // and a stream-CREATED index (no seed) records its geometry on first
    // start, refusing a later restart under different parameters
    CorpusIndex.startNear(docs, "doc_id", "text",
      s"$base/index2", s"$base/pairs2", s"$base/ck2", k = 32, rowsPerBand = 4)
      .awaitTermination()
    assert(CorpusIndex.readNearGeometry(spark, s"$base/index2").contains((32, 4)))
    val restart = intercept[IllegalArgumentException] {
      CorpusIndex.startNear(docs, "doc_id", "text",
        s"$base/index2", s"$base/pairs2", s"$base/ck3")
    }
    assert(restart.getMessage.contains("geometry"))
  }

  test("delta compaction folds the index without changing what a probe sees") {
    val base = Files.createTempDirectory("graft-cic-").toString
    CorpusIndex.seed(Seq((1L, "alpha one"), (2L, "beta two")).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/index")
    // two batch deltas on top of the seed
    Seq((10L, "gamma three")).toDF("doc_id", "text")
      .select(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .write.parquet(s"$base/index/delta=0")
    Seq((11L, "delta four")).toDF("doc_id", "text")
      .select(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .write.parquet(s"$base/index/delta=1")
    val before = CorpusIndex.readIndex(spark, s"$base/index", 99L)
      .as[String].collect().sorted.toSeq
    // folds seed + delta=0; the NEWEST batch delta (1) must survive as-is —
    // a crashed-then-replayed batch 1 depends on excludeDelta finding it
    assert(CorpusIndex.compact(spark, s"$base/index") == 2)
    val after = CorpusIndex.readIndex(spark, s"$base/index", 99L)
      .as[String].collect().sorted.toSeq
    assert(after == before, "compaction must preserve the probe-visible set")
    val dirs = new java.io.File(s"$base/index").listFiles()
      .filter(_.getName.startsWith("delta=")).map(_.getName).sorted.toSeq
    assert(dirs == Seq("delta=-2", "delta=1"), dirs.toString)
    // a replay of batch 1 still sees ONLY the folded base when excluding
    // its own delta — the protection compaction must not break
    val replayView = CorpusIndex.readIndex(spark, s"$base/index", 1L)
      .as[String].collect().sorted.toSeq
    assert(replayView.size == before.size - 1)
    // nothing foldable remains (base + newest batch): no-op
    assert(CorpusIndex.compact(spark, s"$base/index") == 0)
  }

  test("missing index reads as empty; probe never shuffles document text") {
    val empty = CorpusIndex.readIndex(spark,
      Files.createTempDirectory("graft-ci-").toString + "/nope", -42L)
    assert(empty.count() === 0)
  }
}
