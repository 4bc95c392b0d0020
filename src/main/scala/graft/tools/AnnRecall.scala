package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Scale-gate tool: recall-at-scale for the NON-PQ ANN / embedding-near-dup
  * tiers (q43 lshAnn, q46/q100 ivfAnn + persisted index, q44
  * embeddingNearDups, q89 streaming embedding index) — the round-8 ask:
  * `tools/PqRecall` proved fixed ANN parameters can decay silently with
  * corpus growth, so every tier gets the same treatment.
  *
  * Two failure modes, measured separately:
  *
  *  - FIXED parameters (the registry queries' small-SF configs): for
  *    sign-LSH and IVF the recall typically HOLDS as the corpus grows —
  *    the bucket/cell count is fixed, so buckets grow and a probe scans an
  *    ever-larger corpus fraction. The decay is in COST, reported here as
  *    candidates-per-query (the per-probe scan volume).
  *  - AUTO-SIZED parameters ([[Similarity.nPlanesFor]] /
  *    [[Similarity.nlistFor]] / [[Dedup.bitsPerTableFor]], the 100 TB
  *    mode): cost stays bounded by construction, so the question becomes
  *    recall — more planes/cells mean a true neighbor is more likely to
  *    land outside the probed buckets. That recall is what must be
  *    measured at every scale step, and what AnnRecallSpec pins small.
  *
  * Methodology mirrors PqRecall: ground truth is [[Similarity
  * .bruteForceKnn]] over the same query set (top-k tiers), or a
  * deterministic sampled-endpoint exact-cosine pair set (pair tiers).
  * For [[Dedup.embeddingNearDups]] the end-to-end recall EQUALS candidate
  * recall on true pairs (the verify stage is exact and the threshold
  * filter passes every true pair by construction), and a vector's bucket
  * depends only on the vector — so the tool computes bucket collisions on
  * the truth pairs directly instead of materializing the full corpus×corpus
  * pair join. The streaming tier (q89) is measured END TO END: seed the
  * index with the corpus, stream one batch of held-out queries, compare
  * emitted pairs against the batch×corpus exact answer.
  *
  * Usage: runMain graft.tools.AnnRecall <sfDir> [nQueries] [k]
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val nQ = if (args.length > 1) args(1).toInt else 100
    val k = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val queries = emb.where(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpus = emb.where(col("vec_id") >= nQ)
      .select(col("vec_id").as("id"), col("embedding"))
    val nCorpus = corpus.count()

    val exact = Similarity.bruteForceKnn(queries, corpus, k)
      .select(col("qid"), col("nid")).localCheckpoint()

    def timedRecall(label: String, mk: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val approx = mk().select(col("qid"), col("nid")).localCheckpoint()
      val sec = (System.nanoTime() - t0) / 1e9
      val hits = approx.join(exact, Seq("qid", "nid"), "left_semi").count()
      val recall = hits.toDouble / (nQ.toLong * k)
      println(f"""TOPK {"tier":"$label","recall":$recall%.3f,"wall_s":$sec%.1f}""")
    }

    // --- q43 tier: sign-LSH multi-probe top-k ---------------------------
    // fixed = the registry config; auto = nPlanesFor(corpus)
    timedRecall("lsh_fixed_p4",
      () => Similarity.lshAnn(queries, corpus, k, nPlanes = 4, dim = dim, probeBits = 2))
    // pass the PRE-resolved auto values into the timed region: the 0
    // sentinel's internal corpus.count() would otherwise charge the auto
    // tiers a full extra corpus pass the fixed tiers don't pay, biasing
    // the wall_s comparison this tool exists to report
    val planesAuto = Similarity.nPlanesFor(nCorpus)
    timedRecall(s"lsh_auto_p$planesAuto",
      () => Similarity.lshAnn(queries, corpus, k, nPlanes = planesAuto, dim = dim,
        probeBits = 2))

    // --- q46/q100 tier: IVF top-k (in-job and persisted-index serve) ----
    timedRecall("ivf_fixed_l8",
      () => Similarity.ivfAnn(queries, corpus, k, nlist = 8, nprobe = 3))
    val nlistAuto = Similarity.nlistFor(nCorpus)
    timedRecall(s"ivf_auto_l$nlistAuto",
      () => Similarity.ivfAnn(queries, corpus, k, nlist = nlistAuto, nprobe = 4))
    val idxDir = java.nio.file.Files.createTempDirectory("graft-annrecall-")
      .toString + "/ivf"
    Similarity.buildIvfIndex(corpus, idxDir, nlist = nlistAuto)
    timedRecall(s"ivf_index_auto_l$nlistAuto",
      () => Similarity.ivfIndexQuery(queries, idxDir, k, nprobe = 4))
    // sharded serve SCATTER CURVE (r11): nShards ∈ {2,4,8}, per-shard auto
    // nlist, same per-shard nprobe — the capacity path must hold the
    // single-index recall (each shard is a uniform corpus draw), and the
    // serve wall's growth with nShards is the knowingly-paid scatter
    // width: measured here rather than asserted from one point. Build wall
    // reported too (r11 made shard fits concurrent).
    Seq(2, 4, 8).foreach { nSh =>
      val shardDir = java.nio.file.Files.createTempDirectory(
        s"graft-annrecall-sh$nSh-").toString + "/ivf"
      val b0 = System.nanoTime()
      Similarity.buildIvfIndexSharded(corpus, shardDir, nShards = nSh, nlist = 0)
      val buildS = (System.nanoTime() - b0) / 1e9
      println(f"""SHARDBUILD {"n_shards":$nSh,"build_s":$buildS%.1f}""")
      timedRecall(s"ivf_sharded_${nSh}x_auto",
        () => Similarity.ivfIndexQuerySharded(queries, shardDir, k, nprobe = 4))
    }

    // ROUTED sharding curve (r11): space-partitioned shards (top-level
    // quantizer) serve with routeShards ≪ nShards — recall vs serve wall
    // at each routing width, against the same exact truth. This is the
    // dial the id-hash scatter cannot offer.
    val routedDir = java.nio.file.Files.createTempDirectory("graft-annrecall-rt-")
      .toString + "/ivf"
    val rb0 = System.nanoTime()
    Similarity.buildIvfIndexRouted(corpus, routedDir, nShards = 8, nlist = 0)
    println(f"""ROUTEDBUILD {"n_shards":8,"build_s":${(System.nanoTime() - rb0) / 1e9}%.1f}""")
    Seq(1, 2, 4, 8).foreach { r =>
      timedRecall(s"ivf_routed_8x_r$r",
        () => Similarity.ivfIndexQueryRouted(queries, routedDir, k, nprobe = 4,
          routeShards = r))
    }

    // DRIFT + REBALANCE (r14): ingest a region the router has no centroid
    // near — mirrored embeddings (global negation keeps within-region
    // cosine geometry, sits maximally far from every original centroid).
    // The drifted rows' shard assignment among uniformly-far centroids is
    // margin-poor, so narrow routing on drifted queries leaks recall and
    // the arrivals pile unevenly; rebalanceRouted refits the router on
    // the CURRENT corpus and must restore both. Reported, not asserted —
    // this is the measured curve behind the rebalance maintenance call.
    {
      val driftDir = java.nio.file.Files.createTempDirectory("graft-annrecall-dr-")
        .toString + "/ivf"
      Similarity.buildIvfIndexRouted(corpus, driftDir, nShards = 8, nlist = 0)
      val neg = transform(col("embedding"), x => -x)
      val driftRows = corpus.select((col("id") + 900000000L).as("id"),
        neg.as("embedding"))
      // the skew gate would (correctly) refuse this batch and point at the
      // refit; the measurement needs the drifted state on disk, so ingest
      // with the gate lifted — exactly the operator override the gate text
      // names
      Similarity.appendToIvfIndexRouted(driftRows, driftDir, deltaId = 0,
        maxCellSkew = 1e9)
      val negQueries = queries.select(col("qid"), neg.as("embedding"))
      val grown = corpus.unionByName(driftRows)
      val negTruth = Similarity.bruteForceKnn(negQueries, grown, k)
        .select(col("qid"), col("nid")).localCheckpoint()
      def shardSizes(): Seq[Long] = (0 until 8).map { sh =>
        val deltas = new org.apache.hadoop.fs.Path(s"$driftDir/shard=$sh/deltas")
        val fs = deltas.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val c = spark.read.parquet(s"$driftDir/shard=$sh/corpus").count()
        c + (if (fs.exists(deltas)) spark.read.parquet(deltas.toString).count() else 0L)
      }
      def driftRecall(r: Int): Double = {
        val approx = Similarity.ivfIndexQueryRouted(negQueries, driftDir, k,
          nprobe = 4, routeShards = r).select(col("qid"), col("nid"))
        approx.join(negTruth, Seq("qid", "nid"), "left_semi").count()
          .toDouble / (nQ.toLong * k)
      }
      val sizesBefore = shardSizes()
      val imbBefore = sizesBefore.max.toDouble / (sizesBefore.sum.toDouble / 8)
      val beforeR2 = driftRecall(2)
      val rb0 = System.nanoTime()
      val rbStats = Similarity.rebalanceRouted(spark, driftDir)
      val rbS = (System.nanoTime() - rb0) / 1e9
      val sizesAfter = shardSizes()
      val imbAfter = sizesAfter.max.toDouble / (sizesAfter.sum.toDouble / 8)
      val afterR2 = driftRecall(2)
      println(f"""DRIFT {"tier":"routed_drift_r2","recall_before":$beforeR2%.3f,""" +
        f""""recall_after":$afterR2%.3f,"imbalance_before":$imbBefore%.2f,""" +
        f""""imbalance_after":$imbAfter%.2f,"rows_moved":${rbStats.rowsMoved},""" +
        f""""rows_total":${rbStats.rowsTotal},"shards_rebuilt":${rbStats.shardsRebuilt},""" +
        f""""rebalance_s":$rbS%.1f}""")
    }

    // incremental ingest (r11): build on a 60% id-hash draw, append the
    // other 40% as two assignment-only deltas, serve — recall must match
    // the fresh auto-sized build above (the bounded fit sample makes the
    // 60%-fit and full-fit quantizers statistically identical at this
    // scale, so any gap is the append path's)
    val incDir = java.nio.file.Files.createTempDirectory("graft-annrecall-inc-")
      .toString + "/ivf"
    val bInc0 = System.nanoTime()
    Similarity.buildIvfIndex(
      corpus.where(pmod(xxhash64(col("id")), lit(5)) < 3), incDir, nlist = 0)
    val incBuildS = (System.nanoTime() - bInc0) / 1e9
    val a0 = System.nanoTime()
    Similarity.appendToIvfIndex(
      corpus.where(pmod(xxhash64(col("id")), lit(5)) === 3), incDir, deltaId = 0)
    Similarity.appendToIvfIndex(
      corpus.where(pmod(xxhash64(col("id")), lit(5)) === 4), incDir, deltaId = 1)
    val appendS = (System.nanoTime() - a0) / 1e9
    println(f"""INCBUILD {"build60_s":$incBuildS%.1f,"append40_s":$appendS%.1f}""")
    timedRecall("ivf_incremental_auto",
      () => Similarity.ivfIndexQuery(queries, incDir, k, nprobe = 4))

    // --- q44 tier: embedding near-dup pair recall -----------------------
    // Ground truth: every exact cos>=0.9 pair with a sampled endpoint
    // (deterministic ~nQ-id hash sample over the FULL table). A pair is
    // emitted by embeddingNearDups iff its two buckets collide in >=1
    // table (the cosine verify is exact), and buckets are per-row
    // functions, so collision checked on the truth pairs IS the
    // full-corpus recall.
    import graft.functions.VectorFunctions.{dot, norm2, toDouble}
    val all = emb.select(col("vec_id").as("id"), col("embedding"))
    val nAll = nCorpus + nQ
    val sampleEvery = math.max(1L, nAll / nQ)
    val sampled = all.where(pmod(xxhash64(col("id")), lit(sampleEvery)) === 0)
    val sa = sampled.select(col("id").as("id_a"), toDouble(col("embedding")).as("ea"),
      norm2(col("embedding")).as("na"))
    val sb = all.select(col("id").as("id_b"), toDouble(col("embedding")).as("eb"),
      norm2(col("embedding")).as("nb"))
    val truth = sb.join(broadcast(sa), col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("raw"))
      .where(col("raw") >= 0.8999)
      .where(round(col("raw"), 4) >= 0.9)
      .select(col("id_a"), col("id_b")).distinct().localCheckpoint()
    val nTruth = truth.count()

    def pairRecall(label: String, bits: Int, nTables: Int): Unit = {
      val ids = truth.select(col("id_a").as("id"))
        .unionByName(truth.select(col("id_b").as("id"))).distinct()
      val bucketed = Dedup.embeddingBuckets(
          all.join(ids, Seq("id"), "left_semi"), "id", "embedding", dim,
          nTables = nTables, bitsPerTable = bits)
        .groupBy(col("id")).agg(collect_set(col("tb")).as("tbs"))
      val hit = truth
        .join(bucketed.select(col("id").as("id_a"), col("tbs").as("tba")), Seq("id_a"))
        .join(bucketed.select(col("id").as("id_b"), col("tbs").as("tbb")), Seq("id_b"))
        .where(size(array_intersect(col("tba"), col("tbb"))) > 0)
        .count()
      // cost proxy: candidate pairs the within-bucket join would generate
      // over the FULL corpus at this bit width = sum over buckets of
      // C(size, 2) — computable from the bucket histogram without
      // generating a single pair
      val cand = Dedup.embeddingBuckets(all, "id", "embedding", dim,
          nTables = nTables, bitsPerTable = bits)
        .groupBy(col("tb")).count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
        .head().getLong(0)
      println(f"""PAIR {"tier":"$label","bits":$bits,"tables":$nTables,""" +
        f""""pair_recall":${hit.toDouble / math.max(1L, nTruth)}%.3f,""" +
        f""""true_pairs":$nTruth,"candidate_pairs":$cand}""")
    }
    pairRecall("neardup_fixed_b4", 4, 8)
    val bitsAuto = Dedup.bitsPerTableFor(nAll)
    pairRecall(s"neardup_auto_b$bitsAuto", bitsAuto, 8)
    // the recall dial at bounded per-bucket cost: more tables, same bits —
    // per-pair miss falls geometrically with tables while candidate volume
    // grows only linearly (vs exponentially when bits shrink)
    pairRecall(s"neardup_auto_b${bitsAuto}_t12", bitsAuto, 12)

    // --- q84/q102 tier: SemDeDup pair recall ----------------------------
    // semanticNearDups' candidate stage is corpus-dependent (KMeans cells
    // + rank bands), so unlike the sign-LSH tier it must run END TO END:
    // one full pass at the auto-sized quantizer (linear cost by
    // construction, measured sub-linear wall sf10→sf20 in SCALING.md),
    // then recall against the same sampled-endpoint truth. Its documented
    // approximation contract is cluster/band-local comparison — pairs
    // split across cells or >1 band apart are the expected misses.
    val semT0 = System.nanoTime()
    val semPairs = Similarity.semanticNearDups(
        all.select(col("id"), col("embedding")), "id", "embedding",
        threshold = 0.9)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    val semSec = (System.nanoTime() - semT0) / 1e9
    val semHits = truth.join(semPairs, Seq("id_a", "id_b"), "left_semi").count()
    println(f"""SEM {"tier":"semdedup_auto","pair_recall":${
      semHits.toDouble / math.max(1L, nTruth)}%.3f,""" +
      f""""true_pairs":$nTruth,"wall_s":$semSec%.1f}""")

    // --- q89 tier: streaming embedding index, end to end ----------------
    // Seed the full corpus at auto geometry, stream the nQ held-out
    // queries as one batch, compare emitted pairs against the exact
    // batch×corpus answer (cheap: |batch| × n dots).
    val streamBase = java.nio.file.Files.createTempDirectory("graft-annrecall-s-")
      .toString
    graft.streaming.EmbeddingIndex.seed(corpus.select(col("id").as("vec_id"),
      col("embedding")), "vec_id", "embedding", dim, s"$streamBase/index",
      bitsPerTable = 0)
    val (gT, gBits, gDim) = graft.streaming.EmbeddingIndex
      .readGeometry(spark, s"$streamBase/index").get
    val batchDf = queries.select(col("qid").as("vec_id"), col("embedding"))
    batchDf.coalesce(1).write.mode("overwrite").parquet(s"$streamBase/src")
    val stream = spark.readStream.schema(batchDf.schema)
      .parquet(s"$streamBase/src")
    graft.streaming.EmbeddingIndex.start(stream, "vec_id", "embedding", gDim,
      s"$streamBase/index", s"$streamBase/pairs", s"$streamBase/ck",
      threshold = 0.9, nTables = gT, bitsPerTable = gBits)
      .awaitTermination()
    val found = spark.read
      .schema("id_new long, id_other long, cos double, batch long")
      .parquet(s"$streamBase/pairs")
      .select(col("id_new"), col("id_other"))
    val qa = queries.select(col("qid").as("id_new"),
      toDouble(col("embedding")).as("ea"), norm2(col("embedding")).as("na"))
    val streamTruth = corpus
      .select(col("id").as("id_other"), toDouble(col("embedding")).as("eb"),
        norm2(col("embedding")).as("nb"))
      .join(broadcast(qa))
      .select(col("id_new"), col("id_other"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("raw"))
      .where(col("raw") >= 0.8999)
      .where(round(col("raw"), 4) >= 0.9)
      .select(col("id_new"), col("id_other")).localCheckpoint()
    val nStreamTruth = streamTruth.count()
    val streamHits = found.join(streamTruth, Seq("id_new", "id_other"), "left_semi").count()
    println(f"""STREAM {"tier":"stream_index_auto_b$gBits",""" +
      f""""pair_recall":${streamHits.toDouble / math.max(1L, nStreamTruth)}%.3f,""" +
      f""""true_pairs":$nStreamTruth}""")

    println(s"""{"sf":"$sfDir","n_corpus":$nCorpus,"n_queries":$nQ,"k":$k,""" +
      s""""planes_auto":$planesAuto,"nlist_auto":$nlistAuto,"bits_auto":$bitsAuto}""")
    spark.stop()
  }
}
