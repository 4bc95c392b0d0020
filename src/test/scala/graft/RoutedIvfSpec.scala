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

  test("routed appends route by the persisted router; id-hash index refused") {
    val dir = s"${tmpDir("graft-routedappend-")}/index"
    val built = corpus.filter(pmod(xxhash64(col("id")), lit(5)) < 3)
    val grow = corpus.filter(pmod(xxhash64(col("id")), lit(5)) >= 3)
    Similarity.buildIvfIndexRouted(built, dir, nShards = 3, nlist = 4)
    Similarity.appendToIvfIndexRouted(grow, dir, deltaId = 0, maxCellSkew = 64.0)
    // full scatter after the routed append is exact over the grown corpus
    val got = Similarity.ivfIndexQuerySharded(queries, dir, k = 5, nprobe = 4)
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
    assert(topkSet(got) == topkSet(exact))
    // and every appended row landed in the shard the router assigns it
    val routerCents = spark.read.parquet(s"$dir/_router").orderBy(col("shard"))
      .collect().map(_.getAs[scala.collection.Seq[Double]]("centroid").toSeq).toSeq
    val want = Similarity.assignCells(grow.select(col("id"), col("embedding")),
      routerCents).select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 3).foreach { sh =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/shard=$sh/deltas")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        spark.read.parquet(p.toString).select(col("nid")).collect()
          .map(_.getLong(0)).foreach(id =>
            assert(want(id) == sh, s"row $id appended to shard $sh, router says ${want(id)}"))
    }
    val hashDir = s"${tmpDir("graft-routedappendrefuse-")}/index"
    Similarity.buildIvfIndexSharded(built, hashDir, nShards = 2, nlist = 4)
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndexRouted(grow, hashDir, deltaId = 0)
    }
    assert(ex.getMessage.contains("appendToIvfIndexSharded"), ex.getMessage)
  }

  test("rebalanceRouted: fresh router, no row lost, serve exact before and after") {
    val dir = s"${tmpDir("graft-rebal-")}/index"
    // build on 60%, then pile the other 40% in through the router — the
    // drifted-ingest shape (here same-distribution, so the invariants are
    // deterministic; the recall-restoration curve is AnnRecall's job)
    val built = corpus.filter(pmod(xxhash64(col("id")), lit(5)) < 3)
    val grow = corpus.filter(pmod(xxhash64(col("id")), lit(5)) >= 3)
    Similarity.buildIvfIndexRouted(built, dir, nShards = 3, nlist = 4)
    Similarity.appendToIvfIndexRouted(grow, dir, deltaId = 0, maxCellSkew = 64.0)
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
    val before = topkSet(Similarity.ivfIndexQueryRouted(queries, dir, k = 5,
      nprobe = 1000, routeShards = 3))
    assert(before == topkSet(exact), "fixture: full probe must be exact")

    val stats = Similarity.rebalanceRouted(spark, dir, seed = 97L)
    assert(stats.nShards == 3 && stats.rowsTotal == corpus.count(), s"$stats")
    // serve CONTINUITY: the full-probe answer is bit-identical after —
    // membership is a partition of the same rows, the merge exact
    val after = topkSet(Similarity.ivfIndexQueryRouted(queries, dir, k = 5,
      nprobe = 1000, routeShards = 3))
    assert(after == before, "full-probe serve changed across the rebalance")
    // no row lost or duplicated: the union of shard contents is the corpus
    def shardIds(sh: Int): Seq[Long] = {
      val deltas = new org.apache.hadoop.fs.Path(s"$dir/shard=$sh/deltas")
      val fs = deltas.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val c = spark.read.parquet(s"$dir/shard=$sh/corpus").select(col("nid"))
      val both = if (fs.exists(deltas))
        c.unionByName(spark.read.parquet(deltas.toString).select(col("nid")))
      else c
      both.collect().toSeq.map(_.getLong(0))
    }
    val left = (0 until 3).flatMap(shardIds)
    assert(left.size == left.distinct.size, "a row was duplicated")
    assert(left.toSet == corpus.select(col("id")).collect().map(_.getLong(0)).toSet)
    // the router is FRESH and membership matches it exactly
    val cents = spark.read.parquet(s"$dir/_router").orderBy(col("shard"))
      .collect().map(_.getAs[scala.collection.Seq[Double]]("centroid").toSeq).toSeq
    val want = Similarity.assignCells(corpus.select(col("id"), col("embedding")),
      cents).select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 3).foreach { sh =>
      shardIds(sh).foreach(id =>
        assert(want(id) == sh, s"row $id sits in shard $sh, fresh router says ${want(id)}"))
    }
    // narrow routing on the rebalanced index still clears the recall floor
    val narrow = topkSet(Similarity.ivfIndexQueryRouted(queries, dir, k = 5,
      nprobe = 4, routeShards = 2))
    val rec = narrow.count(topkSet(exact).contains).toDouble / topkSet(exact).size
    assert(rec >= 0.5, s"post-rebalance narrow recall $rec")
    // no protocol debris
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Seq("_rebalance-intent", "_rebalance-committed", ".rebalance-stage").foreach(n =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, n)), s"$n left behind"))
  }

  test("rebalanceRouted crash recovery: no marker rolls BACK whole, marker rolls FORWARD") {
    val dir = s"${tmpDir("graft-rebalrec-")}/index"
    Similarity.buildIvfIndexRouted(corpus, dir, nShards = 3, nlist = 4)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val exact = topkSet(Similarity.bruteForceKnn(queries, corpus, k = 5))
    def fullProbe() = topkSet(Similarity.ivfIndexQueryRouted(queries, dir,
      k = 5, nprobe = 1000, routeShards = 3))

    // crash MID-PROMOTE, no marker: shard=0 moved aside, nothing staged in
    // — the live index is torn until recovery ROLLS BACK
    import graft.streaming.FsOps
    val hconf = spark.sparkContext.hadoopConfiguration
    FsOps.atomicWrite(hconf, fs, new org.apache.hadoop.fs.Path(dir, "_rebalance-intent"),
      "shard=0\n_router".getBytes("UTF-8"))
    FsOps.renameOrThrow(fs, new org.apache.hadoop.fs.Path(dir, "shard=0"),
      new org.apache.hadoop.fs.Path(dir, ".rebalance-old-shard=0"))
    // a rebalance call recovers first (roll back), then rebalances cleanly
    val stats = Similarity.rebalanceRouted(spark, dir, seed = 97L)
    assert(stats.rowsTotal == corpus.count())
    assert(fullProbe() == exact, "post-recovery serve must be exact")

    // crash MID-CLEANUP, marker present: stale aside + marker left — the
    // live index is already fully promoted; recovery rolls FORWARD
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, ".rebalance-old-shard=1"))
    fs.create(new org.apache.hadoop.fs.Path(dir, "_rebalance-committed"), true).close()
    FsOps.atomicWrite(hconf, fs, new org.apache.hadoop.fs.Path(dir, "_rebalance-intent"),
      "shard=1".getBytes("UTF-8"))
    val stats2 = Similarity.rebalanceRouted(spark, dir, seed = 98L)
    assert(stats2.rowsTotal == corpus.count())
    assert(fullProbe() == exact)
    Seq("_rebalance-intent", "_rebalance-committed", ".rebalance-old-shard=1")
      .foreach(n => assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, n)),
        s"$n left behind"))
  }
}
