package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PqFunctions._
import graft.functions.VectorFunctions._

/** Product-quantized ANN (Jégou et al. 2011) — the memory-bound tier of
  * the similarity-search family ([[Similarity]] holds the flat/LSH/IVF
  * tiers).
  *
  * Why a fourth tier: at 100 TB the IVF index ([[Similarity.buildIvfIndex]])
  * still stores FULL vectors in every cell — a probe reads nprobe cells of
  * 256-byte rows. PQ compresses each vector to `m` bytes (32× at the
  * defaults for 64-dim float), so the ADC candidate scan touches only the
  * codes column; exact reranking then fetches full vectors for the
  * top-(k·refine) sliver only. The scan tier is CODES-ONLY and the
  * full-vector tier is CANDIDATES-ONLY — the pattern every production ANN
  * service (FAISS IVFPQ serving, ScaNN) uses to keep the index resident.
  *
  * Cosine similarity is served by normalizing both sides once up front
  * (‖x‖=1 ⇒ inner product = cosine): corpus vectors are normalized before
  * encoding, queries before table building, so ADC approximates cosine
  * directly and the exact rerank reproduces [[Similarity.bruteForceKnn]]'s
  * rounded-rank ordering on the surviving candidates.
  *
  * Approximation contract: ADC error comes only from quantization (vector →
  * nearest sub-centroids); reranking is an exact cosine on raw vectors, so
  * emitted neighbors carry TRUE similarities — only the candidate CHOICE is
  * approximate. Recall rises with m, ksub, and refine.
  */
object PqIndex {

  /** Deterministic, bounded, corpus-spread fit sample — same discipline as
    * the IVF quantizer ([[Similarity]] fitSample): global top-maxFitRows by
    * id-hash, a uniform draw at any corpus scale.
    */
  private def fitSample(vec: DataFrame, maxFitRows: Int): DataFrame =
    vec.orderBy(xxhash64(col("id")), col("id")).limit(maxFitRows)

  /** Fit per-subspace codebooks on a bounded sample: m independent KMeans
    * fits (ksub centroids each) over the sample's subvector slices. Few
    * Lloyd iterations — sub-quantizers need to TILE the subspace, not
    * converge (the [[Similarity.semanticNearDups]] coarse-quantizer
    * discipline). Returns the effective ksub, the flattened [m][ksub][dsub]
    * codebook array the [[graft.functions.PqFunctions]] expressions
    * consume, and the measured DISTORTION BAND (below).
    *
    * `dim` must divide by m. ksub is clamped to the sample size (KMeans
    * requires k ≤ n; a corpus smaller than ksub quantizes losslessly
    * anyway). Vectors are normalized BEFORE slicing, so codebooks live in
    * the same space the ADC inner products assume.
    *
    * The band is the p95 of √max(0, 1 − ⟨y, ŷ⟩) over the fit sample
    * (ŷ = decode(encode(y))): with y normalized and the residual r = y − ŷ
    * near-orthogonal to ŷ (Lloyd centroids), 1 − ⟨y, ŷ⟩ ≈ ‖r‖², so the
    * band estimates ‖r‖ — and the ADC error on ANY (query, candidate) pair
    * is |⟨q, r⟩| ≤ ‖r‖. Candidate cuts use it as the score resolution
    * limit: two candidates whose ADC scores differ by less than the band
    * are indistinguishable to the scan tier and BOTH belong in the exact
    * rerank. Computed in the same bounded-sample pass as the fit (one
    * extra aggregation, ≤ maxFitRows rows).
    */
  def fitCodebooks(corpus: DataFrame, embCol: String, dim: Int, m: Int,
      ksub: Int, seed: Long = 42L, maxFitRows: Int = 100000,
      iters: Int = 8): (Int, Array[Double], Double) = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val dsub = dim / m
    val vec = corpus.select(col("id"), l2_normalize(col(embCol)).as("en"))
    val sample = fitSample(vec, maxFitRows).cache()
    // ONE collect feeds all m sub-fits (each slices the same rows locally) —
    // the previous per-subspace distributed KMeans ran m × ~10 stage
    // barriers over this same bounded sample; the cache still serves the
    // band aggregation below
    val rowsArr = Similarity.collectFitRows(sample, "en")
    val n = rowsArr.length
    val k = math.min(ksub, n)
    require(k >= 1, "empty corpus: nothing to fit PQ codebooks on")
    rowsArr.foreach(r => require(r.length == dim,
      s"embedding dim ${r.length} in the fit sample does not match dim=$dim"))
    val books = new Array[Double](m * k * dsub)
    (0 until m).foreach { j =>
      val sliced = rowsArr.map(a => java.util.Arrays.copyOfRange(a, j * dsub, (j + 1) * dsub))
      val cents = Similarity.fitCentroidsLocal(sliced, k, seed + j, iters)
      cents.zipWithIndex.foreach { case (ctr, c) =>
        System.arraycopy(ctr, 0, books, (j * k + c) * dsub, dsub)
      }
    }
    val cb = typedLit(books.toSeq)
    val band = sample
      .select(pq_adc(pq_encode(col("en"), cb, m, k),
        pq_table(col("en"), cb, m, k)).as("selfAdc"))
      .select(percentile_approx(
        sqrt(greatest(lit(0.0), lit(1.0) - col("selfAdc"))),
        lit(0.95), lit(10000)).as("band"))
      .head().getDouble(0)
    sample.unpersist()
    (k, books, band)
  }

  /** Band-adaptive candidate cut shared by the flat and IVF-PQ serve
    * paths: rank by ADC, find each query's boundary score at rank
    * k·refine, then keep EVERY candidate within `band` of that boundary
    * (they are inside the scan tier's score resolution — the exact rerank
    * must see them or recall silently decays as confusable-cluster sizes
    * outgrow a fixed cut; a 100-replica near-dup cluster vs a 40-row cut
    * is exactly the sf10 failure this prevents). The cut is 2·band wide:
    * BOTH the boundary candidate's and a dropped candidate's ADC scores
    * carry up to ~band of quantization error each, so two candidates up
    * to 2·band apart are indistinguishable at scan-tier resolution — a
    * single-band cut could still drop a confusable candidate sitting just
    * below badc − band. `bandCap` bounds the worst case — a degenerate
    * quantizer (band ≈ corpus score spread) degrades to a
    * bigger-but-bounded rerank, never an all-pairs one.
    * Single sort: the boundary min reuses the rank window's partitioning.
    */
  private[operators] def bandCut(adc: DataFrame, k: Int, refine: Int, band: Double,
      bandCap: Int): DataFrame = {
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("adc").desc, col("nid"))
    val wQ = Window.partitionBy(col("qid"))
    adc.withColumn("rn", row_number().over(wAdc))
      .withColumn("badc",
        min(when(col("rn") <= k * refine, col("adc"))).over(wQ))
      .where(col("rn") <= k * refine * bandCap &&
        col("adc") >= col("badc") - 2 * band)
      .select(col("qid"), col("nid"))
  }

  /** Attach the m-byte PQ code of the NORMALIZED embedding as `code`.
    * Map-side, codegen'd, once per corpus version.
    */
  def withCode(df: DataFrame, embCol: String, books: Array[Double], m: Int,
      ksub: Int): DataFrame =
    df.withColumn("code", withCodeCol(col(embCol), books, m, ksub))

  /** Flat PQ + exact rerank: ADC-scan the whole codes table (m bytes/row),
    * keep each query's top k·refine by approximate similarity, rerank that
    * sliver with exact cosine. One corpus pass, no corpus shuffle (queries
    * broadcast), rerank joins fetch only candidates.
    */
  def pqAnn(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      m: Int = 8, ksub: Int = 64, refine: Int = 8, seed: Long = 42L,
      maxFitRows: Int = 100000, bandCap: Int = 32): DataFrame = {
    val c0 = corpus.select(col("id"), col("embedding"))
    val (kEff, books, band) =
      fitCodebooks(c0, "embedding", dim, m, ksub, seed, maxFitRows)
    val cb = typedLit(books.toSeq)
    val codes = withCode(c0, "embedding", books, m, kEff)
      .select(col("id").as("nid"), col("code"))
    val qTab = broadcast(queries.select(col("qid"),
      pq_table(l2_normalize(col("embedding")), cb, m, kEff).as("tbl")))
    val adc = codes.join(qTab)
      .select(col("qid"), col("nid"), pq_adc(col("code"), col("tbl")).as("adc"))
    rerank(bandCut(adc, k, refine, band, bandCap), queries, corpus, k)
  }

  /** Exact-cosine rerank of (qid, nid) candidates: fetch full vectors for
    * the candidate sliver only, reproduce the engine-stable rounded-rank
    * top-k every ANN path shares.
    */
  private[operators] def rerank(cand: DataFrame, queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col("qid"), toDouble(col("embedding")).as("qe"),
      norm2(col("embedding")).as("qn")))
    val c = corpus.select(col("id").as("nid"), col("embedding").as("ne"),
      norm2(col("embedding")).as("nn"))
    // the candidate set is |Q|·k·refine rows in the common case and at
    // most |Q|·k·refine·bandCap after the band cut (32× with defaults —
    // e.g. |Q|=1k, k=10, refine=8, bandCap=32 → ≤2.56M 16-byte rows,
    // ~40 MB, still a safe broadcast); a corpus whose quantizer is so
    // degenerate that every query hits the cap should lower bandCap or
    // refit with larger m before broadcasting billions of candidates
    val fetched = c.join(broadcast(cand), Seq("nid"))
    val sims = fetched.join(q, Seq("qid"))
      .select(col("qid"), col("nid"),
        (dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 4).desc, col("nid"))
    sims.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** Build and persist an IVF-PQ index: coarse KMeans cells (the
    * [[Similarity.buildIvfIndex]] layout) + per-cell PQ codes. Three
    * artifacts under `indexDir`:
    *
    *  - `centroids/` — coarse cell centroids (tiny);
    *  - `codebooks/` — one row: (m, ksub, flattened PQ codebooks, and the
    *    quantizer's p95 distortion `band` driving the serve-side rerank
    *    cut; indexes persisted before the band column existed are read
    *    with band = 0.0, degrading to the fixed k·refine cut);
    *  - `codes/` — (nid, code) partitioned by cell: the m-bytes/row scan
    *    tier;
    *  - `vectors/` — (nid, ne, nn) partitioned by cell: the rerank tier,
    *    read only for ADC survivors.
    *
    * A serving probe reads nprobe cell directories of CODES (partition
    * pruning reaches the file listing), then the same cells' vectors
    * filtered to candidates.
    */
  def buildPqIvfIndex(corpus: DataFrame, indexDir: String, dim: Int,
      nlist: Int = 16, m: Int = 8, ksub: Int = 64, seed: Long = 42L,
      maxFitRows: Int = 100000): Unit = {
    val spark = corpus.sparkSession
    val c0 = corpus.select(col("id"), col("embedding"))
    val (kEff, books, band) =
      fitCodebooks(c0, "embedding", dim, m, ksub, seed, maxFitRows)
    val coarseCents = Similarity.fitQuantizer(fitSample(c0, maxFitRows),
      "embedding", nlist, seed)
    // rebuild discipline (Similarity.buildIvfIndex's delete-first rule):
    // the codebooks row is this index's geometry/commit point and is
    // written LAST — an in-place rebuild with changed dim/m that crashes
    // mid-write would otherwise leave OLD codebooks certifying NEW codes;
    // deleting the old codebooks (and data) first turns that mixed state
    // into a loud missing-path error instead
    Similarity.deleteIndexData(spark, indexDir,
      Seq("codebooks", "codes", "vectors", "centroids"))
    val assigned = Similarity.assignCells(c0, coarseCents)
      .withColumn("code", withCodeCol(col("embedding"), books, m, kEff))
      .select(col("id").as("nid"), toDouble(col("embedding")).as("ne"),
        norm2(toDouble(col("embedding"))).as("nn"),
        col("code"), col("cell"))
      .cache()
    assigned.select(col("nid"), col("code"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/codes")
    assigned.select(col("nid"), col("ne"), col("nn"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/vectors")
    assigned.unpersist()
    val centroids = coarseCents.zipWithIndex.map { case (ctr, i) => (i, ctr) }
    spark.createDataFrame(centroids).toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    // the distortion band is an index-build-time property (a function of
    // the codebooks and the corpus they were fit on) — persist it with the
    // codebooks so every serve call applies the same resolution limit
    // without touching the corpus. dim/nlist ride in the same row (the
    // r10 `_geometry` discipline): a wrong-dim probe must be refused at
    // serve time, not silently NULLed through DotProduct into empty
    // results.
    spark.createDataFrame(Seq((m, kEff, books.toSeq, band, dim, nlist)))
      .toDF("m", "ksub", "books", "band", "dim", "nlist")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebooks")
  }

  private def withCodeCol(emb: org.apache.spark.sql.Column, books: Array[Double],
      m: Int, ksub: Int): org.apache.spark.sql.Column =
    pq_encode(l2_normalize(emb), typedLit(books.toSeq), m, ksub)

  /** Sharded IVF-PQ: `nShards` independent [[buildPqIvfIndex]] instances
    * under `indexDir/shard=<s>/`, rows routed by id-hash — the
    * [[Similarity.buildIvfIndexSharded]] capacity pattern applied to the
    * memory-bound tier. Each shard fits its OWN codebooks and coarse
    * quantizer (id-hash routing keeps every shard a uniform corpus draw,
    * so per-shard quantization quality matches single-index quality);
    * the serve-side merge is sound because each shard's top-k carries
    * EXACT reranked cosines — the global window over the union ranks true
    * similarities, not shard-local ADC scores.
    */
  def buildPqIvfIndexSharded(corpus: DataFrame, indexDir: String, nShards: Int,
      dim: Int, nlist: Int = 16, m: Int = 8, ksub: Int = 64, seed: Long = 42L,
      maxFitRows: Int = 100000): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // empty-shard fail-fast + commit-point-last, the buildIvfIndexSharded
    // discipline: never strand a half-built index a serve would touch
    val present = corpus
      .groupBy(pmod(xxhash64(col("id")), lit(nShards)).as("sh")).count()
      .collect().map(_.getLong(0)).toSet
    val missing = (0L until nShards.toLong).filterNot(present.contains)
    require(missing.isEmpty,
      s"buildPqIvfIndexSharded(nShards=$nShards): shard(s) " +
        s"${missing.take(5).mkString(", ")} would be EMPTY — the corpus is " +
        "too small for this shard count; reduce nShards")
    // concurrent shard builds — the Similarity.buildIvfIndexSharded
    // rationale: overlap each shard's driver-side fit phases with the
    // others' cluster work; shards write disjoint directories
    Similarity.shardScatter(nShards) { sh =>
      buildPqIvfIndex(
        corpus.where(pmod(xxhash64(col("id")), lit(nShards)) === sh),
        s"$indexDir/shard=$sh", dim, nlist, m, ksub, seed + sh, maxFitRows)
    }
    corpus.sparkSession.createDataFrame(Seq(Tuple1(nShards))).toDF("n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_sharding")
  }

  /** INCREMENTAL ingest into a persisted [[buildPqIvfIndex]] index — the
    * [[Similarity.appendToIvfIndex]] protocol applied to the memory-bound
    * tier: assign `newRows` (id, embedding) to the EXISTING coarse
    * centroids, encode with the EXISTING codebooks (no refit of either),
    * and append idempotent per-batch deltas under
    * `indexDir/codes_deltas/delta=<id>/cell=<c>` and
    * `indexDir/vectors_deltas/delta=<id>/cell=<c>`. Serving reads
    * base ∪ deltas with the same cell pruning on both tiers. Same guards:
    * dim geometry required, skewed batches refused (drifted data needs a
    * refit — and stale CODEBOOKS additionally inflate quantization error
    * on drifted appends, which the band-adaptive rerank absorbs only up
    * to a point).
    */
  def appendToPqIvfIndex(newRows: DataFrame, indexDir: String, deltaId: Long,
      maxCellSkew: Double = 8.0): Unit = {
    require(deltaId >= 0, s"deltaId must be >= 0 (got $deltaId): negative ids " +
      "are reserved for compacted bases")
    val spark = newRows.sparkSession
    val meta = IndexMeta.cached(spark, s"$indexDir/codebooks") {
      spark.read.parquet(s"$indexDir/codebooks").head()
    }
    require(meta.schema.fieldNames.contains("dim"),
      s"PQ index at $indexDir predates the dim geometry column: appends " +
        "cannot be dim-validated against it — rebuild with buildPqIvfIndex first")
    val dim = meta.getAs[Int]("dim")
    val nlist = meta.getAs[Int]("nlist")
    val m = meta.getAs[Int]("m")
    val ksub = meta.getAs[Int]("ksub")
    val books = meta.getAs[scala.collection.Seq[Double]]("books").toArray
    Similarity.requireProbeDim(
      newRows.select(col("id").as("qid"), col("embedding")), dim, indexDir)
    // the validated (dense 0..k-1) cached loader — assignCells' positional
    // centroid literal mis-routes on a centroids table with holes
    val cents = Similarity.centroidSeq(spark, indexDir)
    val assigned = Similarity.assignCells(
        newRows.select(col("id"), col("embedding")), cents)
      .withColumn("code", withCodeCol(col("embedding"), books, m, ksub))
      .select(col("id").as("nid"), toDouble(col("embedding")).as("ne"),
        norm2(toDouble(col("embedding"))).as("nn"), col("code"), col("cell"))
    val counts = assigned.groupBy(col("cell")).count().collect()
    val n = counts.map(_.getLong(1)).sum
    if (n == 0) return
    val maxCell = counts.map(_.getLong(1)).max
    val balanced = math.max(1.0, n.toDouble / nlist)
    require(maxCell <= maxCellSkew * balanced,
      f"appendToPqIvfIndex($indexDir, delta=$deltaId): batch assignment is " +
        f"skewed — heaviest cell holds $maxCell of $n rows " +
        f"(${maxCell / balanced}%.1f× the balanced share, gate $maxCellSkew%.1f×). " +
        "The new data has drifted off the fitted quantizer/codebooks; " +
        "rebuild with buildPqIvfIndex instead of appending")
    // codes first, vectors second, each idempotent per-delta: a crash
    // between the two leaves a delta whose ADC candidates cannot fetch
    // rerank vectors — the retry overwrites both dirs; serving between
    // crash and retry loses the half-appended batch's rows from results
    // (an availability gap, never a wrong answer: rerank inner-joins)
    assigned.select(col("nid"), col("code"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/codes_deltas/delta=$deltaId")
    assigned.select(col("nid"), col("ne"), col("nn"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/vectors_deltas/delta=$deltaId")
  }

  /** [[appendToPqIvfIndex]] for a sharded index — same id-hash routing as
    * the build, shards appended concurrently.
    */
  def appendToPqIvfIndexSharded(newRows: DataFrame, indexDir: String,
      deltaId: Long, maxCellSkew: Double = 8.0): Unit = {
    val spark = newRows.sparkSession
    val nShards = Similarity.readSharding(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"$indexDir carries no _sharding row — append to a single index with " +
          "appendToPqIvfIndex, or build with buildPqIvfIndexSharded"))
    Similarity.shardScatter(nShards) { sh =>
      appendToPqIvfIndex(
        newRows.where(pmod(xxhash64(col("id")), lit(nShards)) === sh),
        s"$indexDir/shard=$sh", deltaId, maxCellSkew)
    }
    ()
  }

  /** Fold a PQ index's accumulated append deltas (both tiers). */
  def compactPqIvfDeltas(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Int =
    Similarity.foldCellDeltas(spark, s"$indexDir/codes_deltas") +
      Similarity.foldCellDeltas(spark, s"$indexDir/vectors_deltas")

  /** Build a ROUTED sharded IVF-PQ index — the
    * [[Similarity.buildIvfIndexRouted]] two-level shape applied to the
    * memory-bound tier (r12 verdict ask #5): a top-level quantizer with
    * `nShards` cells partitions the embedding SPACE, each shard builds its
    * own [[buildPqIvfIndex]] (own coarse quantizer AND own codebooks — a
    * space shard's narrower distribution quantizes with LOWER distortion
    * than a uniform draw), and the router centroids persist under
    * `_router/`. Serving probes `routeShards ≪ nShards` shards
    * ([[pqIvfQueryRouted]]) — the serve-cost dial the id-hash scatter
    * cannot offer, on the tier most likely to be sharded (it exists
    * because the corpus outgrew memory). The merge stays sound for the
    * same reason as the scatter's: per-shard top-ks carry EXACT reranked
    * cosines, so the global window ranks true similarities.
    */
  def buildPqIvfIndexRouted(corpus: DataFrame, indexDir: String, nShards: Int,
      dim: Int, nlist: Int = 16, m: Int = 8, ksub: Int = 64, seed: Long = 42L,
      maxFitRows: Int = 100000): Unit = {
    require(nShards > 1, s"nShards must be > 1 for a routed index, got $nShards")
    val spark = corpus.sparkSession
    val routerCents = Similarity.fitQuantizer(
      fitSample(corpus.select(col("id"), col("embedding")), maxFitRows),
      "embedding", nShards, seed)
    val routed = Similarity.assignCells(
        corpus.select(col("id"), col("embedding")), routerCents)
      .withColumnRenamed("cell", "__shard")
    val present = routed.groupBy(col("__shard")).count()
      .collect().map(_.getInt(0)).toSet
    val missing = (0 until nShards).filterNot(present.contains)
    require(missing.isEmpty,
      s"buildPqIvfIndexRouted(nShards=$nShards): router cell(s) " +
        s"${missing.take(5).mkString(", ")} attracted no rows — the corpus " +
        "does not support this many space shards; reduce nShards")
    Similarity.shardScatter(nShards) { sh =>
      buildPqIvfIndex(
        routed.where(col("__shard") === sh).select(col("id"), col("embedding")),
        s"$indexDir/shard=$sh", dim, nlist, m, ksub, seed + sh, maxFitRows)
    }
    spark.createDataFrame(routerCents.zipWithIndex.map { case (c, i) => (i, c) })
      .toDF("shard", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_router")
    // _sharding stays the commit point, after router AND every shard
    spark.createDataFrame(Seq(Tuple1(nShards))).toDF("n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_sharding")
  }

  /** Serve a [[buildPqIvfIndexRouted]] index probing each query's
    * `routeShards` nearest space shards only. `routeShards >= nShards`
    * degenerates to the full scatter and returns results identical to
    * [[pqIvfQuerySharded]] on the same index (pinned in RoutedIvfSpec) —
    * the router is a cost dial, not a different answer.
    */
  def pqIvfQueryRouted(queries: DataFrame, indexDir: String, k: Int,
      nprobe: Int = 4, refine: Int = 8, bandCap: Int = 32,
      routeShards: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val nShards = Similarity.readSharding(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"$indexDir carries no _sharding row — not a sharded IVF-PQ index"))
    Similarity.requireRouter(spark, indexDir,
      "pqIvfQuerySharded", "buildPqIvfIndexRouted")
    val r = math.min(math.max(1, routeShards), nShards)
    if (r == nShards)
      return pqIvfQuerySharded(queries, indexDir, k, nprobe, refine, bandCap)
    // validate the batch ONCE against shard 0's persisted dim (all shards
    // of one build share it) — pq_table must never see a wrong-dim vector
    val meta0 = IndexMeta.cached(spark, s"$indexDir/shard=0/codebooks") {
      spark.read.parquet(s"$indexDir/shard=0/codebooks").head()
    }
    if (meta0.schema.fieldNames.contains("dim"))
      Similarity.requireProbeDim(queries, meta0.getAs[Int]("dim"), indexDir)
    val byShard = Similarity.routeQueries(queries, indexDir, r)
    // empty probe batch = legal empty serve — shard 0 yields the schema
    if (byShard.isEmpty)
      return pqIvfQueryImpl(queries, s"$indexDir/shard=0", k, nprobe, refine,
        bandCap, allowPreBandIndex = false, validateProbe = false)
    Similarity.shardScatter(byShard.size) { i =>
        val (sh, qids) = byShard(i)
        pqIvfQueryImpl(queries.where(col("qid").isInCollection(qids)),
          s"$indexDir/shard=$sh", k, nprobe, refine, bandCap,
          allowPreBandIndex = false, validateProbe = false)
      }
      .reduce(_ unionByName _)
      .transform(Similarity.topK(_, k))
  }

  /** Serve a [[buildPqIvfIndexSharded]] index: scatter to every shard
    * ([[pqIvfQuery]] — per-shard codebooks, ADC scan, band cut, exact
    * rerank), gather per-shard top-ks, merge to the global top-k.
    */
  def pqIvfQuerySharded(queries: DataFrame, indexDir: String, k: Int,
      nprobe: Int = 4, refine: Int = 8, bandCap: Int = 32): DataFrame = {
    val spark = queries.sparkSession
    val nShards = Similarity.readSharding(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"$indexDir carries no _sharding row — not a sharded IVF-PQ index " +
          "(serve a single index with pqIvfQuery, or rebuild with " +
          "buildPqIvfIndexSharded)"))
    // validate the batch ONCE against shard 0's persisted dim (all shards
    // of one build share it), then scatter with per-shard validation off
    val meta0 = IndexMeta.cached(spark, s"$indexDir/shard=0/codebooks") {
      spark.read.parquet(s"$indexDir/shard=0/codebooks").head()
    }
    if (meta0.schema.fieldNames.contains("dim"))
      Similarity.requireProbeDim(queries, meta0.getAs[Int]("dim"), indexDir)
    else
      // the single-index serve's pre-geometry warning, mirrored: a sharded
      // index whose codebooks predate the dim column serves wrong-dim
      // probes as silent empty results — say so loudly instead of skipping
      // validation without a signal
      System.err.println(s"[graft] WARNING: sharded PQ index $indexDir " +
        "predates the dim geometry column — a wrong-dim probe against it " +
        "fails only downstream (or returns empty results); rebuild with " +
        "buildPqIvfIndexSharded")
    // concurrent scatter (Similarity.shardScatter): plan-time per-shard
    // work — codebook read, probe-plan collect — runs on a bounded pool
    // instead of serializing; the cell scans execute together under the
    // merged plan
    Similarity.shardScatter(nShards)(sh =>
        pqIvfQueryImpl(queries, s"$indexDir/shard=$sh", k, nprobe, refine,
          bandCap, allowPreBandIndex = false, validateProbe = false))
      .reduce(_ unionByName _)
      // the ONE engine-stable ranking every ANN path shares
      .transform(Similarity.topK(_, k))
  }

  /** Serve a query batch from a [[buildPqIvfIndex]] index: rank centroids,
    * partition-pruned read of the probed cells' CODES, ADC top-(k·refine),
    * then a partition-pruned read of the same cells' vectors for the exact
    * rerank. The serving contract mirrors [[Similarity.ivfIndexQuery]]:
    * the probe plan's |Q|·nprobe rows are collected once to drive pruning.
    */
  /** `allowPreBandIndex`: indexes persisted before the distortion band was
    * added to the codebooks row can only serve the fixed k·refine cut —
    * the exact configuration whose recall was MEASURED collapsing as
    * confusable clusters outgrow the cut (0.456@sf10 / 0.268@sf20,
    * SCALING.md `tools/PqRecall`). Serving one is therefore refused by
    * default with a rebuild instruction; pass true to opt in (a loud
    * warning still fires), e.g. for a read-only migration window.
    */
  def pqIvfQuery(queries: DataFrame, indexDir: String, k: Int,
      nprobe: Int = 4, refine: Int = 8, bandCap: Int = 32,
      allowPreBandIndex: Boolean = false): DataFrame =
    pqIvfQueryImpl(queries, indexDir, k, nprobe, refine, bandCap,
      allowPreBandIndex, validateProbe = true)

  /** `validateProbe = false` skips the dim handshake — ONLY for the
    * sharded serve, which validates the batch once against shard 0 (all
    * shards of one build share dim by construction). Unlike the IVF serve
    * (whose validation is free on its collected probe rows), the PQ check
    * must run BEFORE the probe plan: `pq_table` evaluates on the raw
    * embedding and must never see a wrong-dim vector.
    */
  private def pqIvfQueryImpl(queries: DataFrame, indexDir: String, k: Int,
      nprobe: Int, refine: Int, bandCap: Int,
      allowPreBandIndex: Boolean, validateProbe: Boolean): DataFrame = {
    val spark = queries.sparkSession
    val centDf = broadcast(IndexMeta.cachedTable(spark, s"$indexDir/centroids"))
    val meta = IndexMeta.cached(spark, s"$indexDir/codebooks") {
      spark.read.parquet(s"$indexDir/codebooks").head()
    }
    val m = meta.getAs[Int]("m")
    val ksub = meta.getAs[Int]("ksub")
    // refuse a wrong-dim probe up front (the r10 geometry discipline —
    // Similarity.requireProbeDim documents the silent-miss mode this
    // turns into an error); indexes persisted before the dim column are
    // served with a loud warning instead
    if (validateProbe) {
      if (meta.schema.fieldNames.contains("dim"))
        Similarity.requireProbeDim(queries, meta.getAs[Int]("dim"), indexDir)
      else
        System.err.println(s"[graft] WARNING: PQ index $indexDir predates the " +
          "dim geometry column — a wrong-dim probe against it fails only " +
          "downstream (or returns empty results); rebuild with buildPqIvfIndex")
    }
    val band =
      if (meta.schema.fieldNames.contains("band")) meta.getAs[Double]("band")
      else if (allowPreBandIndex) {
        System.err.println(s"[graft] WARNING: serving PRE-BAND PQ index " +
          s"$indexDir with the fixed k*refine cut (band=0.0) — recall decays " +
          "as confusable-cluster sizes outgrow the cut (measured 0.268 " +
          "recall@sf20); rebuild with PqIndex.buildPqIvfIndex to restore the " +
          "band-adaptive rerank")
        0.0
      } else throw new IllegalStateException(
        s"PQ index at $indexDir predates the distortion-band codebooks row: " +
          "serving it uses the fixed k*refine candidate cut, whose recall is " +
          "measured collapsing at scale (0.456@sf10 / 0.268@sf20, SCALING.md). " +
          "Rebuild the index with PqIndex.buildPqIvfIndex, or pass " +
          "allowPreBandIndex = true to serve it anyway.")
    val books = meta.getAs[scala.collection.Seq[Double]]("books").toArray
    val cb = typedLit(books.toSeq)
    val qe0 = toDouble(col("embedding"))
    val qe = queries.select(col("qid"), qe0.as("qe"), norm2(qe0).as("qn"),
      pq_table(l2_normalize(col("embedding")), cb, m, ksub).as("tbl"))
    val wCell = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cell"))
    val probePlan = qe.crossJoin(centDf)
      .withColumn("cdist", l2Distance(col("qe"), col("centroid")))
      .withColumn("crn", row_number().over(wCell))
      .where(col("crn") <= nprobe)
      .select(col("qid"), col("qe"), col("qn"), col("tbl"), col("cell"))
    val probeRows = probePlan.collect().toSeq
    val cells = probeRows.map(_.getAs[Int]("cell")).distinct
    // local relation: driver-side broadcast build, no per-serve RDD stage
    // (the Similarity.ivfIndexQuery rationale)
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probePlan.schema)
    // base ∪ append deltas on both tiers (incremental ingest), cell-pruned
    val codes = Similarity.readWithDeltas(spark, s"$indexDir/codes",
      s"$indexDir/codes_deltas", cells, Seq("nid", "code", "cell"))
    val adc = codes.join(broadcast(probes.select(col("qid"), col("tbl"), col("cell"))),
        Seq("cell"))
      .select(col("qid"), col("nid"), pq_adc(col("code"), col("tbl")).as("adc"))
    val cand = bandCut(adc, k, refine, band, bandCap)
    val vectors = Similarity.readWithDeltas(spark, s"$indexDir/vectors",
      s"$indexDir/vectors_deltas", cells, Seq("nid", "ne", "nn", "cell"))
      .join(broadcast(cand), Seq("nid"))
    val q = broadcast(probes.select(col("qid"), col("qe"), col("qn")).distinct())
    val sims = vectors.join(q, Seq("qid"))
      .select(col("qid"), col("nid"),
        (dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("sim"))
    // the ONE engine-stable ranking every ANN path shares — a drifted copy
    // here would silently diverge PQ ordering from the IVF tiers
    Similarity.topK(sims, k)
  }
}
