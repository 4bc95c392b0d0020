package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Regression pins for the recall-at-scale program (`tools/AnnRecall`,
  * SCALING.md): the auto-sizing helpers must keep growing bucket/cell
  * counts with the corpus, and the RECALL those auto-sized parameters
  * deliver must survive large-corpus geometry — pinned here small and
  * deterministic by running the operators with parameters sized AS IF the
  * corpus were millions of rows (the recall math depends only on the
  * geometry, not on how many background rows share it).
  */
class AnnRecallSpec extends SparkSuite {
  import spark.implicits._

  // planted structure: one source vector with `nReplicas` perturbed twins
  // (the ScaleData shape — replicas at cosine ~0.95-0.99), plus far-away
  // background
  private def planted(nReplicas: Int, nBackground: Int, noise: Double) = {
    val rnd = new scala.util.Random(11)
    def randVec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val baseVec = randVec()
    val replicas = (0 until nReplicas).map { i =>
      (1000L + i, baseVec.map(v => v + rnd.nextGaussian() * noise).toSeq)
    }
    val background = (0 until nBackground).map(i => (100000L + i, randVec().toSeq))
    (baseVec, (replicas ++ background).toDF("id", "embedding"))
  }

  test("auto-sizing helpers: monotone, clamped, tracking the corpus") {
    assert(Similarity.nPlanesFor(1000) == 4) // floor
    assert(Similarity.nPlanesFor(1000000) == 11) // 1M/512 ~ 2^11
    assert(Similarity.nPlanesFor(100000000000L) == 24) // ceiling
    assert(Similarity.nlistFor(10000) == 8) // floor
    assert(Similarity.nlistFor(1000000) == 245) // 1M/4096
    assert(Similarity.nlistFor(100000000000L) == 4096) // ceiling
    val planes = Seq(1L, 100000L, 10000000L).map(Similarity.nPlanesFor(_))
    assert(planes == planes.sorted)
  }

  test("lshAnn recall survives large-corpus plane counts (nPlanes for ~2M rows)") {
    // nPlanesFor(2M) = 12: a true neighbor at cosine ~0.98 must still be
    // reachable within probeBits=2 sign flips of the query's 12-bit
    // bucket. This is the q43 tier's scale-decay pin: if a code change
    // weakens multi-probe (or the bucketing), recall collapses here first.
    val (baseVec, corpus) = planted(nReplicas = 50, nBackground = 2000, noise = 0.02)
    assert(Similarity.nPlanesFor(2000000) == 12)
    val queries = Seq((0L, baseVec.toSeq)).toDF("qid", "embedding")
    val approx = Similarity.lshAnn(queries, corpus, k = 5, nPlanes = 12,
      dim = 64, probeBits = 2)
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
    val hits = approx.select($"qid", $"nid")
      .join(exact.select($"qid", $"nid"), Seq("qid", "nid"), "left_semi").count()
    assert(hits >= 4, s"lsh recall ${hits / 5.0} < 0.8 at 12-plane geometry")
  }

  test("embeddingNearDups recall survives large-corpus bit widths (bits for ~2M rows)") {
    // bitsPerTableFor(2M) = 12. True pairs here are replica twins at
    // cosine ~0.96; per-table bucket agreement falls with bits but the OR
    // over 8 tables must keep pair recall high — the q44/q89 tier's
    // scale-decay pin.
    val (_, corpus) = planted(nReplicas = 30, nBackground = 500, noise = 0.03)
    assert(Dedup.bitsPerTableFor(2000000) == 12)
    val found = Dedup.embeddingNearDups(corpus, "id", "embedding", dim = 64,
      threshold = 0.9, bitsPerTable = 12)
      .where($"id_a" < 100000L && $"id_b" < 100000L) // replica-replica pairs
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // exact truth among the 30 replicas (tiny all-pairs)
    import graft.functions.VectorFunctions._
    val reps = corpus.where($"id" < 100000L)
    val truth = reps.select($"id".as("id_a"), toDouble($"embedding").as("ea"))
      .join(reps.select($"id".as("id_b"), toDouble($"embedding").as("eb")),
        $"id_a" < $"id_b")
      .where(round(cosineSimilarity($"ea", $"eb"), 4) >= 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 100, s"fixture too weak: ${truth.size} true pairs")
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.9, s"pair recall $recall < 0.9 at 12-bit geometry")
  }

  test("auto sentinels resolve from the corpus (nPlanes=0 / nlist=0 / bits=0)") {
    val (baseVec, corpus) = planted(nReplicas = 20, nBackground = 300, noise = 0.02)
    val queries = Seq((0L, baseVec.toSeq)).toDF("qid", "embedding")
    // tiny corpus → every helper clamps to its floor; the point is the
    // sentinel path executes and returns the contract shape
    assert(Similarity.lshAnn(queries, corpus, k = 3, nPlanes = 0, dim = 64,
      probeBits = 2).count() == 3)
    assert(Similarity.ivfAnn(queries, corpus, k = 3, nlist = 0, nprobe = 4)
      .count() == 3)
    assert(Dedup.embeddingNearDups(corpus.limit(50), "id", "embedding",
      dim = 64, bitsPerTable = 0).columns.contains("cos"))
  }

  test("EmbeddingIndex: seeded geometry is persisted and start() refuses a mismatch") {
    import graft.streaming.EmbeddingIndex
    val base = tmpDir("graft-annrec-geom-")
    val (_, corpus) = planted(nReplicas = 10, nBackground = 100, noise = 0.02)
    val emb = corpus.select($"id".as("vec_id"),
      $"embedding".cast("array<float>").as("embedding"))
    // auto bits resolve from the seed corpus and land in _geometry
    EmbeddingIndex.seed(emb, "vec_id", "embedding", dim = 64,
      s"$base/index", bitsPerTable = 0)
    val geom = EmbeddingIndex.readGeometry(spark, s"$base/index")
    assert(geom.contains((12, Dedup.bitsPerTableFor(110), 64)))
    // the _geometry row must be invisible to the delta partition read
    assert(spark.read.parquet(s"$base/index").columns.contains("delta"))
    // start() under a different geometry would silently miss every indexed
    // row — it must refuse instead
    // batch = 5 of the replicas: their other 5 twins stay index-only, so
    // the matched-geometry stream must find cross pairs
    emb.where($"vec_id" >= 1000L && $"vec_id" < 1005L)
      .write.mode("overwrite").parquet(s"$base/src")
    val stream = spark.readStream.schema(emb.schema).parquet(s"$base/src")
    val ex = intercept[IllegalArgumentException] {
      EmbeddingIndex.start(stream, "vec_id", "embedding", dim = 64,
        s"$base/index", s"$base/out", s"$base/ck", bitsPerTable = 12)
    }
    assert(ex.getMessage.contains("geometry"))
    // matching geometry streams fine and finds the replica pairs
    val (t, b, d) = geom.get
    EmbeddingIndex.start(stream, "vec_id", "embedding", d,
      s"$base/index", s"$base/out", s"$base/ck",
      nTables = t, bitsPerTable = b).awaitTermination()
    val found = spark.read
      .schema("id_new long, id_other long, cos double, batch long")
      .parquet(s"$base/out")
    assert(found.count() > 0)
    // re-seeding over the streamed delta must refuse: seed only rewrites
    // delta=-1 + _geometry, so a geometry change would strand the streamed
    // rows under old hyperplanes while the new row certifies consistency
    val reseed = intercept[IllegalArgumentException] {
      EmbeddingIndex.seed(emb, "vec_id", "embedding", dim = 64,
        s"$base/index", bitsPerTable = 12)
    }
    assert(reseed.getMessage.contains("streaming delta"))
  }

  test("a stream-created EmbeddingIndex persists its geometry on first start") {
    // the guard must not depend on how the index was born: an index built
    // purely by streaming (no seed) records its geometry on first start,
    // so a later restart under different parameters is refused instead of
    // silently probing past every accumulated delta
    import graft.streaming.EmbeddingIndex
    val base = tmpDir("graft-annrec-streamgeom-")
    val (_, corpus) = planted(nReplicas = 6, nBackground = 40, noise = 0.02)
    val emb = corpus.select($"id".as("vec_id"),
      $"embedding".cast("array<float>").as("embedding"))
    emb.write.mode("overwrite").parquet(s"$base/src")
    def stream() = spark.readStream.schema(emb.schema).parquet(s"$base/src")
    EmbeddingIndex.start(stream(), "vec_id", "embedding", dim = 64,
      s"$base/index", s"$base/out", s"$base/ck",
      bitsPerTable = 6).awaitTermination()
    assert(EmbeddingIndex.readGeometry(spark, s"$base/index").contains((12, 6, 64)))
    val ex = intercept[IllegalArgumentException] {
      EmbeddingIndex.start(stream(), "vec_id", "embedding", dim = 64,
        s"$base/index", s"$base/out", s"$base/ck2", bitsPerTable = 4)
    }
    assert(ex.getMessage.contains("geometry"))
    // and the 0 sentinel is rejected up front for streams (unbounded
    // corpus — nothing to auto-size against)
    val ex0 = intercept[IllegalArgumentException] {
      EmbeddingIndex.start(stream(), "vec_id", "embedding", dim = 64,
        s"$base/index2", s"$base/out2", s"$base/ck3", bitsPerTable = 0)
    }
    assert(ex0.getMessage.contains("explicit"))
  }
}
