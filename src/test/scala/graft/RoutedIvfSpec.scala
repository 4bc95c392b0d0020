package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Routed (space-partitioned) sharded IVF (r11): a top-level quantizer
  * routes rows to shards at build and queries to `routeShards` shards at
  * serve — the cost dial the id-hash sharding cannot offer (uniform-draw
  * shards make every shard equally likely to hold the true neighbor, so
  * skipping any loses recall proportionally; the serve refuses routing
  * on such an index).
  */
class RoutedIvfSpec extends SparkSuite {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding"))
  private def corpus = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("id"), col("embedding"))

  private def topkSet(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("router at r = nShards IS the full scatter: results identical") {
    val dir = s"${tmpDir("graft-routed-")}/index"
    Similarity.buildIvfIndexRouted(corpus, dir, nShards = 4, nlist = 4)
    val routedFull = Similarity.ivfIndexQueryRouted(queries, dir, k = 5,
      nprobe = 4, routeShards = 4)
    val scatter = Similarity.ivfIndexQuerySharded(queries, dir, k = 5, nprobe = 4)
    assert(topkSet(routedFull) == topkSet(scatter))
    // full probe width on every shard reproduces the exact answer — the
    // routed LAYOUT loses nothing; only routing narrows
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
    assert(topkSet(scatter) == topkSet(exact))
  }

  test("narrow routing serves k rows per query; recall grows monotonically with routeShards") {
    val dir = s"${tmpDir("graft-routednarrow-")}/index"
    Similarity.buildIvfIndexRouted(corpus, dir, nShards = 4, nlist = 4)
    val exact = topkSet(Similarity.bruteForceKnn(queries, corpus, k = 5))
    def recallAt(r: Int): Double = {
      val got = Similarity.ivfIndexQueryRouted(queries, dir, k = 5,
        nprobe = 4, routeShards = r)
      assert(got.groupBy("qid").count().collect().forall(_.getLong(1) == 5),
        s"routeShards=$r did not serve k rows per query")
      topkSet(got).count(exact.contains).toDouble / exact.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2); val r4 = recallAt(4)
    assert(r1 <= r2 + 1e-9 && r2 <= r4 + 1e-9, s"recall not monotone: $r1 $r2 $r4")
    assert(r4 == 1.0, s"full routing at full probe width must be exact, got $r4")
    assert(r1 > 0.3, s"nearest-shard routing recall $r1 degenerate — routing broken")
  }

  test("an id-hash sharded index refuses routing (no meaningful shard order to skip)") {
    val dir = s"${tmpDir("graft-routedrefuse-")}/index"
    Similarity.buildIvfIndexSharded(corpus, dir, nShards = 2, nlist = 4)
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfIndexQueryRouted(queries, dir, k = 5, routeShards = 1)
    }
    assert(ex.getMessage.contains("ivfIndexQuerySharded"), ex.getMessage)
  }

  test("incremental appends compose with the routed layout per shard") {
    // appends target a shard's sub-index directly (each shard IS a
    // buildIvfIndex index) — rows must route by the SAME top-level
    // centroids the build used
    val dir = s"${tmpDir("graft-routedinc-")}/index"
    val built = corpus.filter(pmod(xxhash64(col("id")), lit(5)) < 3)
    val grow = corpus.filter(pmod(xxhash64(col("id")), lit(5)) >= 3)
    Similarity.buildIvfIndexRouted(built, dir, nShards = 3, nlist = 4)
    val routerCents = spark.read.parquet(s"$dir/_router").orderBy(col("shard"))
      .collect().map(_.getAs[scala.collection.Seq[Double]]("centroid").toSeq).toSeq
    val routed = Similarity.assignCells(grow.select(col("id"), col("embedding")),
      routerCents)
    (0 until 3).foreach { sh =>
      val slice = routed.where(col("cell") === sh).select(col("id"), col("embedding"))
      // space-routed slices are clustered by construction — the drift-skew
      // gate is not under test here, so give it room
      if (slice.limit(1).count() > 0)
        Similarity.appendToIvfIndex(slice, s"$dir/shard=$sh", deltaId = 0,
          maxCellSkew = 64.0)
    }
    val got = Similarity.ivfIndexQuerySharded(queries, dir, k = 5, nprobe = 4)
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
    assert(topkSet(got) == topkSet(exact))
  }

  test("routed IVF-PQ: full routing == scatter; recall monotone; id-hash refused") {
    import graft.operators.PqIndex
    val dir = s"${tmpDir("graft-routedpq-")}/index"
    PqIndex.buildPqIvfIndexRouted(corpus, dir, nShards = 3, dim = 64,
      nlist = 4, m = 8, ksub = 16)
    // full routing degenerates to the scatter, identical results
    val routedFull = PqIndex.pqIvfQueryRouted(queries, dir, k = 5,
      nprobe = 4, routeShards = 3)
    val scatter = PqIndex.pqIvfQuerySharded(queries, dir, k = 5, nprobe = 4)
    assert(topkSet(routedFull) == topkSet(scatter))
    // recall monotone in routeShards, against the exact answer
    val exact = topkSet(Similarity.bruteForceKnn(queries, corpus, k = 5))
    def recallAt(r: Int): Double = {
      val got = PqIndex.pqIvfQueryRouted(queries, dir, k = 5,
        nprobe = 4, routeShards = r)
      assert(got.groupBy("qid").count().collect().forall(_.getLong(1) == 5),
        s"routeShards=$r did not serve k rows per query")
      topkSet(got).count(exact.contains).toDouble / exact.size
    }
    val r1 = recallAt(1); val r3 = recallAt(3)
    assert(r1 <= r3 + 1e-9, s"recall not monotone: $r1 $r3")
    assert(r1 > 0.3, s"nearest-shard PQ routing recall $r1 degenerate")
    // wrong-dim probes refused once, up front
    val bad = queries.withColumn("embedding", slice(col("embedding"), 1, 8))
    val exDim = intercept[IllegalArgumentException] {
      PqIndex.pqIvfQueryRouted(bad, dir, k = 5, routeShards = 1)
    }
    assert(exDim.getMessage.contains("dim"), exDim.getMessage)
    // an id-hash sharded PQ index refuses routing
    val hashDir = s"${tmpDir("graft-routedpqrefuse-")}/index"
    PqIndex.buildPqIvfIndexSharded(corpus, hashDir, nShards = 2, dim = 64,
      nlist = 4, m = 8, ksub = 16)
    val ex = intercept[IllegalArgumentException] {
      PqIndex.pqIvfQueryRouted(queries, hashDir, k = 5, routeShards = 1)
    }
    assert(ex.getMessage.contains("pqIvfQuerySharded"), ex.getMessage)
  }
}
