package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Round-10 hardening: a pre-geometry index (delta data on disk, no
  * `_geometry` row — seeded before the row existed, or the r9 crash window
  * between data and geometry writes) must not have the CALLER's parameters
  * silently certified as its geometry: start()/startNear() cannot verify
  * they match the hyperplanes/MinHash the existing deltas were actually
  * bucketed under, and enshrining a wrong guess makes every probe miss the
  * pre-existing rows while future mismatch errors blame the wrong side.
  * Adoption now requires an explicit `adoptGeometry = true` vouch.
  * (seed()/seedNear() also write `_geometry` BEFORE the delta data now, so
  * the crash window can no longer CREATE this state — only legacy indexes
  * carry it.)
  */
class HardeningR10Spec extends SparkSuite {
  import spark.implicits._

  private def deleteGeometry(indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/_geometry")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(p, true), s"no _geometry to delete under $indexDir")
  }

  private def stage(rows: Seq[(Long, Seq[Float])], dir: String, name: String,
      mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("graft-r10-stage-").toString
    rows.toDF("id", "emb").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(dir))
    Files.move(part.toPath, Paths.get(dir, s"$name.parquet"))
    Files.setLastModifiedTime(Paths.get(dir, s"$name.parquet"), FileTime.fromMillis(mtime))
  }

  test("pre-geometry embedding index: start() refuses to adopt caller params; adoptGeometry vouches") {
    val base = tmpDir("graft-r10-emb-")
    val seedRows = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "emb")
    EmbeddingIndex.seed(seedRows, "id", "emb", dim = 4, s"$base/index",
      nTables = 8, bitsPerTable = 4)
    // simulate a legacy index: data present, geometry row gone
    deleteGeometry(s"$base/index")
    assert(EmbeddingIndex.readGeometry(spark, s"$base/index").isEmpty)
    val src = s"$base/src"
    stage(Seq((10L, Seq(1.0f, 0.01f, 0.0f, 0.0f))), src, "b0",
      System.currentTimeMillis() - 60000)
    def stream = spark.readStream.schema("id long, emb array<float>").parquet(src)
    val ex = intercept[IllegalArgumentException] {
      EmbeddingIndex.start(stream, "id", "emb", dim = 4,
        s"$base/index", s"$base/out", s"$base/ck", threshold = 0.9,
        nTables = 8, bitsPerTable = 4)
    }
    assert(ex.getMessage.contains("adoptGeometry"), ex.getMessage)
    // nothing was certified by the refusal
    assert(EmbeddingIndex.readGeometry(spark, s"$base/index").isEmpty)
    // the vouched call proceeds, probes the seed, and certifies the params
    EmbeddingIndex.start(stream, "id", "emb", dim = 4,
      s"$base/index", s"$base/out", s"$base/ck", threshold = 0.9,
      nTables = 8, bitsPerTable = 4, adoptGeometry = true)
      .awaitTermination()
    assert(EmbeddingIndex.readGeometry(spark, s"$base/index").contains((8, 4, 4)))
    val pairs = spark.read.schema("id_new long, id_other long, cos double, batch long")
      .parquet(s"$base/out")
      .select($"id_new", $"id_other").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 1L)), s"got $pairs")
  }

  test("pre-geometry near-dup index: startNear() refuses to adopt caller params; adoptGeometry vouches") {
    val base = tmpDir("graft-r10-near-")
    def words(seed: String) = (1 to 30).map(i => s"$seed$i").mkString(" ")
    CorpusIndex.seedNear(Seq((1L, words("alpha"))).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/index", k = 16, rowsPerBand = 2)
    deleteGeometry(s"$base/index")
    assert(CorpusIndex.readNearGeometry(spark, s"$base/index").isEmpty)
    val src = s"$base/src"
    val tmp = Files.createTempDirectory("graft-r10-near-stage-").toString
    Seq((10L, words("alpha") + " tail")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(src))
    Files.move(part.toPath, Paths.get(src, "b0.parquet"))
    def stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    val ex = intercept[IllegalArgumentException] {
      CorpusIndex.startNear(stream, "doc_id", "text",
        s"$base/index", s"$base/pairs", s"$base/ck", k = 16, rowsPerBand = 2)
    }
    assert(ex.getMessage.contains("adoptGeometry"), ex.getMessage)
    assert(CorpusIndex.readNearGeometry(spark, s"$base/index").isEmpty)
    CorpusIndex.startNear(stream, "doc_id", "text",
      s"$base/index", s"$base/pairs", s"$base/ck", k = 16, rowsPerBand = 2,
      adoptGeometry = true).awaitTermination()
    assert(CorpusIndex.readNearGeometry(spark, s"$base/index").contains((16, 2)))
    val got = spark.read.schema("id_new long, id_other long, jaccard double, batch long")
      .parquet(s"$base/pairs").select($"id_new", $"id_other").as[(Long, Long)]
      .collect().toSet
    assert(got == Set((10L, 1L)), s"got $got")
  }

  test("re-seed with changed geometry replaces delta=-1 atomically enough: old data never sits under the new certificate") {
    val base = tmpDir("graft-r10-reseed-")
    val rows = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f, 0.0f))).toDF("id", "emb")
    EmbeddingIndex.seed(rows, "id", "emb", dim = 4, s"$base/index",
      nTables = 8, bitsPerTable = 4)
    // legal re-seed (no streamed deltas yet) under different geometry
    EmbeddingIndex.seed(rows, "id", "emb", dim = 4, s"$base/index",
      nTables = 12, bitsPerTable = 6)
    assert(EmbeddingIndex.readGeometry(spark, s"$base/index").contains((12, 6, 4)))
    // the re-seeded index probes correctly under the NEW geometry: a
    // stream under the carried parameters finds the seed pair (old
    // 8-table data under the new certificate would find nothing)
    val src = s"$base/src"
    stage(Seq((10L, Seq(1.0f, 0.0f, 0.0f, 0.0f))), src, "b0",
      System.currentTimeMillis() - 60000)
    EmbeddingIndex.start(
      spark.readStream.schema("id long, emb array<float>").parquet(src),
      "id", "emb", dim = 4, s"$base/index", s"$base/out", s"$base/ck",
      threshold = 0.9, nTables = 12, bitsPerTable = 6)
      .awaitTermination()
    val pairs = spark.read
      .schema("id_new long, id_other long, cos double, batch long")
      .parquet(s"$base/out")
      .select($"id_new", $"id_other").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 1L)), s"got $pairs")
  }

  test("seed() writes _geometry before delta data (crash leaves geometry, never orphan data)") {
    // the observable contract: a fresh seed's geometry row exists and an
    // index holding ONLY a geometry row (the new crash state) starts clean
    // under the carried parameters with no adoption prompt
    val base = tmpDir("graft-r10-order-")
    EmbeddingIndex.seed(Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "emb"),
      "id", "emb", dim = 4, s"$base/index", nTables = 8, bitsPerTable = 4)
    // simulate the crash AFTER geometry, BEFORE data: drop delta=-1
    val d = new org.apache.hadoop.fs.Path(s"$base/index/delta=-1")
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(d, true))
    assert(EmbeddingIndex.readGeometry(spark, s"$base/index").contains((8, 4, 4)))
    val src = s"$base/src"
    stage(Seq((10L, Seq(0.0f, 1.0f, 0.0f, 0.0f))), src, "b0",
      System.currentTimeMillis() - 60000)
    // carried geometry → starts without adoptGeometry, no exception
    EmbeddingIndex.start(
      spark.readStream.schema("id long, emb array<float>").parquet(src),
      "id", "emb", dim = 4, s"$base/index", s"$base/out", s"$base/ck",
      threshold = 0.9, nTables = 8, bitsPerTable = 4)
      .awaitTermination()
    assert(spark.read
      .schema("id_new long, id_other long, cos double, batch long")
      .parquet(s"$base/out").count() == 0)
  }
}
