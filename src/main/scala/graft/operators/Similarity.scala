package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceKnn]]: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; one pass, no shuffle of the corpus, then
  *    a per-query top-k window on the (|Q| × n) similarity table.
  *  - [[lshAnn]]: random-hyperplane LSH bucketing — corpus is hashed once
  *    to sign-pattern buckets; queries probe only their own bucket. At
  *    100 TB this turns a full scan per query into a bucket-local scan;
  *    buckets are the shuffle key, so the corpus shuffles once, ever, and
  *    can be persisted bucketed for repeated querying.
  */
object Similarity {

  /** Exact top-k: `queries` (qid, embedding) is broadcast; `corpus`
    * (id, embedding) streams through codegen'd cosine expressions.
    */
  /** `rankScale`: ranking compares similarities rounded to this many
    * decimals (ties broken by nid), so top-k membership is stable across
    * engines/summation orders — sub-1e-4 similarity differences must not
    * reorder results between runs.
    */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int, rankScale: Int = 4): DataFrame = {
    // norms are computed ONCE per row before the pair join (not once per
    // pair — |Q|× less work on the corpus side); the per-pair cost is a
    // single codegen'd dot + one divide over the raw float arrays
    val q = broadcast(queries.select(col("qid"), col("embedding").as("qe"),
      norm2(col("embedding")).as("qn")))
    val c = corpus.select(col("id").as("nid"), col("embedding").as("ne"),
      norm2(col("embedding")).as("nn"))
    val sims = c.join(q)
      .select(col("qid"), col("nid"),
        (dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), rankScale).desc, col("nid"))
    sims.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** Deterministic pseudo-random hyperplanes: coefficient (p,i) derives from
    * md5("p:i") — reproducible across runs/engines with no RNG state.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (p, i) =>
      val h = md.digest(s"$p:$i".getBytes("UTF-8"))
      ((h(0) & 0xff) - 127.5) / 127.5 // in [-1, 1]
    }
  }

  /** Sign-pattern bucket id for every row of `df` (id, embedding). Each
    * plane test is a codegen'd dot of the raw (float) embedding against a
    * double-literal plane — no interpreted cast pass.
    */
  def withBucket(df: DataFrame, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val bucket = planes.zipWithIndex.map { case (plane, p) =>
      when(dot(col("embedding"), typedLit(plane.toSeq)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** Hyperplane count sized to the corpus — the [[Dedup.bitsPerTableFor]]
    * discipline applied to the ANN bucketing: buckets must GROW with n
    * (2^nPlanes ≈ n / targetBucketRows) or per-bucket scan cost
    * degenerates toward a full corpus scan as the corpus outgrows a fixed
    * plane count. Clamped to [4, 24]. Recall decays slowly as planes grow
    * (each extra bit costs ~(1 − θ/π) per bucket-match for a true
    * neighbor at angle θ, compensated by multi-probe): measured at
    * sf10/sf20 in SCALING.md (`tools/AnnRecall`), pinned small in
    * AnnRecallSpec.
    */
  def nPlanesFor(corpusRows: Long, targetBucketRows: Int = 512): Int =
    Dedup.bitsPerTableFor(corpusRows, targetBucketRows)

  /** IVF cell count sized to the corpus: cells track `targetCellRows`
    * (nlist ≈ n / targetCellRows, clamped to [8, 4096]) instead of n/nlist
    * growing with the corpus — a fixed nlist makes every probe scan
    * O(corpus/nlist) rows, which is a linear-in-n serve cost at 100 TB.
    * 4096 cells × 4096 target rows covers ~16M rows per index shard;
    * beyond that, shard the index — [[buildIvfIndexSharded]] (one coarse
    * quantizer per shard, scatter-gather serve) — rather than inflating a
    * single KMeans fit.
    */
  def nlistFor(corpusRows: Long, targetCellRows: Int = 4096): Int =
    math.min(4096L, math.max(8L,
      (corpusRows + targetCellRows - 1) / targetCellRows)).toInt

  /** Coarse-quantizer KMeans fit — the one fit every ANN builder uses.
    * Quantizer cells only need to CO-LOCATE neighbors, not converge, so
    * the fit runs few Lloyd iterations from a random-sample init.
    *
    * The fit is DRIVER-LOCAL (r14): the fit set is already a bounded
    * sample ([[fitSample]], ≤ maxFitRows ≈ 100k rows × dim doubles —
    * tens of MB, the same driver-metadata scale as the collected probe
    * plans and centroid tables), but the previous Spark-ML fit ran
    * every Lloyd iteration as a full distributed pass: ~10 stage
    * barriers per fit to do arithmetic a driver does in milliseconds,
    * and the PQ builder pays that m+1 times per index. One TakeOrdered
    * collect replaces them all; on a cluster the same barriers are the
    * cost, so the trade improves with scale, and the sample bound keeps
    * driver memory flat regardless of corpus size. Iteration is
    * multi-threaded over FIXED row chunks with partial sums merged in
    * chunk order, so results are bit-deterministic for a given
    * (sample, k, seed) on any machine/thread count — tighter than the
    * Spark-ML fit, whose reduce order could vary with partitioning.
    * Recall is gated independently: every serve path carries a
    * machine-checked recall contract, and the AnnRecall / PqRecall /
    * CapRecall scale tools re-measure after quantizer changes.
    *
    * Returns exactly min(k, sample rows) centroids (an empty cell keeps
    * its previous centroid, the Spark-ML behavior); ties in assignment
    * resolve to the lowest cell, matching [[graft.functions.NearestCell]].
    */
  private[operators] def fitQuantizer(fitSet: DataFrame, embCol: String,
      k: Int, seed: Long, iters: Int = 8): Seq[Seq[Double]] =
    fitCentroidsLocal(collectFitRows(fitSet, embCol), k, seed, iters)
      .map(_.toSeq).toSeq

  /** Collect a (sampled) fit set's embedding column as flat arrays — the
    * one action a quantizer fit costs.
    */
  private[operators] def collectFitRows(fitSet: DataFrame,
      embCol: String): Array[Array[Double]] =
    fitSet.select(toDouble(col(embCol)).as("__e")).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Deterministic local Lloyd iterations (see [[fitQuantizer]]). */
  private[graft] def fitCentroidsLocal(rows: Array[Array[Double]], k0: Int,
      seed: Long, iters: Int): Array[Array[Double]] = {
    val n = rows.length
    require(n > 0, "empty fit sample: nothing to fit a quantizer on")
    val dim = rows(0).length
    var ri = 0
    while (ri < n) {
      require(rows(ri).length == dim,
        s"ragged fit sample: row $ri has dim ${rows(ri).length}, expected $dim")
      ri += 1
    }
    val k = math.max(1, math.min(k0, n))
    // seeded Fisher–Yates prefix: k distinct sample rows as the init
    val rnd = new java.util.Random(seed)
    val idx = Array.tabulate(n)(identity)
    var j = 0
    while (j < k) {
      val swap = j + rnd.nextInt(n - j)
      val t = idx(j); idx(j) = idx(swap); idx(swap) = t
      j += 1
    }
    var cents = Array.tabulate(k)(c => rows(idx(c)).clone())
    val assign = new Array[Int](n)
    val chunk = 8192
    val nChunks = (n + chunk - 1) / chunk
    var it = 0
    var moved = true
    while (it < iters && moved) {
      // 1. assignment — parallel over fixed chunks; ties -> lowest cell
      //    (the NearestCell rule), each chunk writing a disjoint slice
      val centsLocal = cents
      val changed = new java.util.concurrent.atomic.LongAdder
      java.util.stream.IntStream.range(0, nChunks).parallel().forEach { ci =>
        val lo = ci * chunk
        val hi = math.min(n, lo + chunk)
        var r = lo
        var localChanged = 0L
        while (r < hi) {
          val v = rows(r)
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            val ctr = centsLocal(c)
            var d = 0.0
            var q = 0
            while (q < dim) { val x = ctr(q) - v(q); d += x * x; q += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          if (assign(r) != best) { assign(r) = best; localChanged += 1 }
          r += 1
        }
        changed.add(localChanged)
      }
      // the first pass must always compute means (assign starts all-0);
      // afterwards an unchanged assignment is the Lloyd fixpoint
      moved = it == 0 || changed.sum() > 0
      // 2. means — per-chunk partial sums merged IN CHUNK ORDER, so the
      //    floating-point accumulation order is fixed across machines
      val sums = new Array[Array[Double]](nChunks)
      val cnts = new Array[Array[Long]](nChunks)
      java.util.stream.IntStream.range(0, nChunks).parallel().forEach { ci =>
        val s = new Array[Double](k * dim)
        val cn = new Array[Long](k)
        val lo = ci * chunk
        val hi = math.min(n, lo + chunk)
        var r = lo
        while (r < hi) {
          val off = assign(r) * dim
          val v = rows(r)
          var q = 0
          while (q < dim) { s(off + q) += v(q); q += 1 }
          cn(assign(r)) += 1
          r += 1
        }
        sums(ci) = s; cnts(ci) = cn
      }
      val total = new Array[Double](k * dim)
      val totalN = new Array[Long](k)
      var ci = 0
      while (ci < nChunks) {
        val s = sums(ci); val cn = cnts(ci)
        var p = 0
        while (p < k * dim) { total(p) += s(p); p += 1 }
        var c = 0
        while (c < k) { totalN(c) += cn(c); c += 1 }
        ci += 1
      }
      cents = Array.tabulate(k) { c =>
        if (totalN(c) == 0) cents(c) // empty cell: keep previous centroid
        else {
          val a = new Array[Double](dim)
          val off = c * dim
          var q = 0
          while (q < dim) { a(q) = total(off + q) / totalN(c); q += 1 }
          a
        }
      }
      it += 1
    }
    cents
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * plus all buckets within `probeBits` sign flips (multi-probe LSH —
    * near neighbors that straddle a hyperplane land one bit away, so
    * probing adjacent buckets recovers most of the recall loss without
    * scanning the corpus).
    *
    * `nPlanes` trades recall for bucket size (16 planes ⇒ 65k buckets).
    * `nPlanes = 0` auto-sizes to the corpus via [[nPlanesFor]] (one
    * metadata-cheap count pass) — the at-scale mode: fixed planes are
    * fine for a known corpus size, but recall/cost silently drifts when
    * the corpus grows under them.
    * The corpus is hashed and shuffled by bucket once; only the (small)
    * query side fans out ×(1+nPlanes) for probing.
    */
  def lshAnn(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 8, dim: Int = 64, probeBits: Int = 1): DataFrame = {
    val np = if (nPlanes > 0) nPlanes else nPlanesFor(corpus.count())
    val q0 = withBucket(queries.select(col("qid"), col("embedding")), np, dim)
      .select(col("qid"), col("embedding").as("qe"),
        norm2(col("embedding")).as("qn"), col("bucket"))
    // all XOR masks with ≤ probeBits bits set over np planes — enumerated
    // as bit-position combinations (C(np, ≤probeBits) masks), never 2^np
    val masks: Seq[Long] = (0 to probeBits).flatMap(sz =>
      (0 until np).combinations(sz).map(_.foldLeft(0L)((m, p) => m | (1L << p))))
    val flips: Seq[org.apache.spark.sql.Column] = masks.map(lit(_))
    val q = broadcast(q0
      .withColumn("__flip", explode(array(flips: _*)))
      .withColumn("bucket", col("bucket").bitwiseXOR(col("__flip")))
      .drop("__flip"))
    val c = withBucket(corpus.select(col("id").as("nid"), col("embedding")), np, dim)
      .select(col("nid"), col("embedding").as("ne"),
        norm2(col("embedding")).as("nn"), col("bucket"))
    val sims = c.join(q, Seq("bucket"))
      .select(col("qid"), col("nid"),
        (dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 4).desc, col("nid"))
    sims.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** Rank each query's centroids and keep its `nprobe` nearest cells —
    * the probe-planning stage shared by [[ivfAnn]] and [[ivfIndexQuery]].
    */
  private def rankedProbes(qe: DataFrame, centDf: DataFrame, nprobe: Int): DataFrame = {
    val wCell = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cell"))
    qe.crossJoin(centDf)
      .withColumn("cdist", l2Distance(col("qe"), col("centroid")))
      .withColumn("crn", row_number().over(wCell))
      .where(col("crn") <= nprobe)
      .select(col("qid"), col("qe"), col("qn"), col("cell"))
  }

  /** Bounded, deterministic, corpus-spread quantizer fit sample: global
    * top-`maxFitRows` by `xxhash64(id)` (id tie-break) — a uniform draw
    * over the corpus regardless of id locality, computed as one
    * TakeOrdered pass (per-partition heaps + merge, same cost shape as an
    * id-prefix sort). An id-PREFIX sample (the r6 form) mirrors ingest
    * order: once the corpus outgrows the sample (sf10: ≤20% coverage), a
    * time- or shard-clustered id space would feed the quantizer a biased
    * region of embedding space; the hash draw stays representative at any
    * scale.
    */
  private[operators] def fitSample(vec: DataFrame, maxFitRows: Int): DataFrame =
    vec.orderBy(xxhash64(col("id")), col("id")).limit(maxFitRows)

  /** Per-query top-k on a (qid, nid, sim) table — rounded-sim ranking with
    * nid tie-break, the engine-stable ordering every ANN path shares.
    */
  private[operators] def topK(sims: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 4).desc, col("nid"))
    sims.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** IVF (inverted-file) approximate NN: a KMeans coarse quantizer
    * partitions the corpus into `nlist` cells; each query scans only its
    * `nprobe` nearest cells. The classic ANN scale path: the corpus is
    * assigned once (and can be persisted bucketed by cell); per-query work
    * drops from O(n) to O(n·nprobe/nlist). Deterministic via fixed seed.
    * `nlist = 0` auto-sizes cells to the corpus via [[nlistFor]] — at a
    * fixed nlist, per-probe cost grows linearly with the corpus.
    */
  def ivfAnn(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      maxFitRows: Int = 100000): DataFrame = {
    val nl = if (nlist > 0) nlist else nlistFor(corpus.count())
    // Fit the coarse quantizer on a bounded, deterministic, corpus-SPREAD
    // sample (top maxFitRows by id-hash — a uniform draw, where an id-prefix
    // would mirror ingest order and skew the centroids once the corpus
    // outgrows the sample): KMeans over the FULL corpus is a multi-pass
    // scale-killer at 100 TB, and centroid quality saturates long before
    // 100k rows. The full corpus is still assigned to cells exactly once.
    val c0 = corpus.select(col("id"), col("embedding"))
    val cents = fitQuantizer(fitSample(c0, maxFitRows), "embedding", nl, seed)
    val assigned = assignCells(c0, cents)
      .select(col("id").as("nid"), col("embedding").as("ne"),
        norm2(col("embedding")).as("nn"), col("cell"))
    // rank each query's centroids; probe the nprobe nearest cells
    val centroids = cents.zipWithIndex.map { case (ctr, i) => (i, ctr) }
    val centDf = broadcast(queries.sparkSession.createDataFrame(centroids)
      .toDF("cell", "centroid"))
    val qe = queries.select(col("qid"), toDouble(col("embedding")).as("qe"),
      norm2(col("embedding")).as("qn"))
    val probes = rankedProbes(qe, centDf, nprobe)
    val sims = assigned.join(broadcast(probes), Seq("cell"))
      .select(col("qid"), col("nid"),
        (dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("sim"))
    topK(sims, k)
  }

  /** Build and PERSIST an IVF index: the KMeans coarse quantizer's
    * centroids (tiny parquet) plus the corpus assigned to cells, written
    * `partitionBy("cell")` — the layout is the index. A probe reads ONLY
    * its nprobe cells' directories (partition pruning), so repeated query
    * batches never rescan or re-fit: build once per corpus version, query
    * forever. This is the persisted form of [[ivfAnn]] (which fits and
    * assigns per call — right for one-shot jobs, wasteful for a serving
    * pattern).
    */
  def buildIvfIndex(corpus: DataFrame, indexDir: String, nlist: Int = 16,
      seed: Long = 42L, maxFitRows: Int = 100000): Unit = {
    val nl0 = if (nlist > 0) nlist else nlistFor(corpus.count())
    val c0 = corpus.select(col("id"), col("embedding"))
    // k clamps to the sample size inside the local fit (the fitCodebooks
    // discipline): a sub-nlist corpus — e.g. a small space-routed shard —
    // quantizes losslessly at k = n anyway. One collect, no cache/count.
    val cents = fitQuantizer(fitSample(c0, maxFitRows), "embedding", nl0, seed)
    val nl = cents.size
    // REBUILD discipline (the EmbeddingIndex.seed delete-first rule):
    // remove any existing corpus/centroids BEFORE the new geometry lands —
    // otherwise an in-place rebuild with changed dim/nlist that crashes
    // after the geometry write leaves NEW geometry certifying STALE data,
    // and probes against the mix return empty results green. After the
    // delete, a crash leaves geometry over MISSING data — a loud read
    // error, never a silent wrong answer.
    deleteIndexData(corpus.sparkSession, indexDir, Seq("corpus", "centroids"))
    // dimension comes FREE from the fitted centroids (they live in the
    // corpus space) — a separate head() on the corpus scan billed every
    // build an extra action. Geometry still lands BEFORE the cells (the
    // EmbeddingIndex ordering: a crash mid-build leaves geometry, never
    // unlabeled cells a later probe would have to guess at).
    writeIvfGeometry(corpus.sparkSession, indexDir, cents.head.size, nl)
    // assignment through the same NearestCell expression the append path
    // uses, so built and appended rows quantize identically by construction
    assignCells(c0, cents)
      .select(col("id").as("nid"), toDouble(col("embedding")).as("ne"),
        norm2(toDouble(col("embedding"))).as("nn"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/corpus")
    val centroids = cents.zipWithIndex.map { case (ctr, i) => (i, ctr) }
    corpus.sparkSession.createDataFrame(centroids).toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** Remove existing index data dirs before a rebuild's geometry write —
    * shared by the IVF and IVF-PQ builders.
    */
  private[operators] def deleteIndexData(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, subdirs: Seq[String]): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    subdirs.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$d")
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) graft.streaming.FsOps.deleteOrThrow(fs, p, recursive = true)
    }
  }

  private[operators] def writeIvfGeometry(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, dim: Int, nlist: Int): Unit =
    spark.createDataFrame(Seq((dim, nlist, "cosine")))
      .toDF("dim", "nlist", "metric")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_geometry")

  /** The persisted index's (dim, nlist, metric), if it carries a geometry
    * row (indexes built before r10 do not — their probes are validated
    * only against `expectedDim` if the caller supplies it).
    */
  def readIvfGeometry(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[(Int, Int, String)] = {
    IndexMeta.cached(spark, s"$indexDir/_geometry") {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/_geometry")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val r = spark.read.parquet(s"$indexDir/_geometry").head()
        Some((r.getAs[Int]("dim"), r.getAs[Int]("nlist"), r.getAs[String]("metric")))
      }
    }
  }

  /** Refuse a probe whose vectors don't match the index's dimension.
    * Without this, a wrong-dim probe runs GREEN and returns nothing:
    * [[graft.functions.DotProduct]] yields NULL on length mismatch, the
    * NULL similarity fails every comparison, and the top-k window simply
    * emits no rows — the silent-miss failure class the `_geometry` rows
    * exist to turn into errors. The probe side is small by the serving
    * contract, so min/max over it is a cheap action (and catches a RAGGED
    * query batch, not just a uniformly wrong one).
    */
  private[operators] def requireProbeDim(queries: DataFrame, indexDim: Int,
      indexDir: String): Unit = {
    val r = queries.agg(count(lit(1)).as("n"), count(col("embedding")).as("nn"),
      min(size(col("embedding"))).as("lo"),
      max(size(col("embedding"))).as("hi")).head()
    // an EMPTY probe batch is a legal serve (returns empty results, the
    // pre-r10 behavior) — min/max are NULL there, so bail before reading
    // them as ints (NPE otherwise)
    if (r.getLong(0) == 0) return
    // NULL embeddings slip past min/max (aggregates skip nulls) but NULL
    // through every similarity expression downstream — same silent-empty
    // mode as a wrong dim; refuse them by the same rule
    require(r.getLong(1) == r.getLong(0),
      s"probe batch has ${r.getLong(0) - r.getLong(1)} NULL embedding(s) " +
        s"(of ${r.getLong(0)} rows) against index $indexDir — NULL probes " +
        "NULL through the similarity expressions and return empty results " +
        "with no error; filter or re-embed them")
    val (lo, hi) = (r.getInt(2), r.getInt(3))
    require(lo == indexDim && hi == indexDim,
      s"probe dimension ${if (lo == hi) lo.toString else s"$lo..$hi"} does " +
        s"not match index $indexDir geometry (dim=$indexDim): a mismatched " +
        "probe NULLs through the similarity expressions and returns empty " +
        "results with no error — re-embed the queries or probe the right index")
  }

  /** The zero-extra-job form of [[requireProbeDim]]: validate the query
    * vectors riding in ALREADY-COLLECTED probe rows (column `qe`) against
    * the index dimension. Same refusal semantics; used by the IVF serve
    * paths, whose probe-plan collect materializes every query's vector
    * anyway. (The PQ serve keeps the aggregation pre-check instead: its
    * probe plan evaluates `pq_table` on the raw embedding, which must not
    * see a wrong-dim vector.)
    */
  private[operators] def validateProbeRows(rows: Seq[org.apache.spark.sql.Row],
      indexDim: Int, indexDir: String): Unit = {
    if (rows.isEmpty) return // empty batch = legal empty serve
    val byQid = rows.groupBy(_.getAs[Any]("qid")).view
      .mapValues(_.head).toMap
    val nullQids = byQid.count { case (_, r) => r.isNullAt(r.fieldIndex("qe")) }
    require(nullQids == 0,
      s"probe batch has $nullQids NULL embedding(s) (of ${byQid.size} " +
        s"queries) against index $indexDir — NULL probes NULL through the " +
        "similarity expressions and return empty results with no error; " +
        "filter or re-embed them")
    val sizes = byQid.valuesIterator
      .map(r => r.getAs[scala.collection.Seq[Double]]("qe").size).toSeq
    val (lo, hi) = (sizes.min, sizes.max)
    require(lo == indexDim && hi == indexDim,
      s"probe dimension ${if (lo == hi) lo.toString else s"$lo..$hi"} does " +
        s"not match index $indexDir geometry (dim=$indexDim): a mismatched " +
        "probe NULLs through the similarity expressions and returns empty " +
        "results with no error — re-embed the queries or probe the right index")
  }

  /** Nearest-centroid cell id for each row of `rows` (id, embedding) — a
    * NARROW, join-free assignment: the centroid table rides as a literal
    * in the task closure (≤ nlist·dim doubles — 4096 cells × 64 dims ≈
    * 2 MB, the same budget as [[semanticNearDups]]'s cell literal), each
    * row computes nlist exact L2 distances and takes the argmin. This is
    * the incremental-ingest counterpart of the build-time
    * `model.transform` — assigning to the TRUE nearest centroid is exactly
    * what the probe side's centroid ranking assumes, so appended rows are
    * found by the same `nprobe` cells as built rows.
    */
  private[graft] def assignCells(rows: DataFrame,
      centroids: Seq[Seq[Double]]): DataFrame =
    // native codegen'd argmin (graft.functions.NearestCell): the HOF form
    // (transform + aggregate + zip_with over a centroid literal) measured
    // ~10× slower on the sf20 append — per-element lambdas are interpreted;
    // the expression runs two fused native loops over a task-closure table.
    // Ties resolve to the LOWEST cell id, deterministic across engines.
    rows.withColumn("cell",
      graft.functions.NearestCell.nearest_cell(toDouble(col("embedding")), centroids))

  /** The index's centroid table as a cell-indexed sequence (position i =
    * cell i), validated complete — a centroids table with holes would make
    * [[assignCells]]'s positional literal mis-route every row after the gap.
    */
  private[operators] def centroidSeq(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Seq[Seq[Double]] = {
    IndexMeta.cached(spark, s"$indexDir/centroids") {
      val rows = spark.read.parquet(s"$indexDir/centroids")
        .orderBy(col("cell")).collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        require(r.getAs[Int]("cell") == i,
          s"centroids table at $indexDir is not a dense 0..k-1 cell range " +
            s"(position $i holds cell ${r.getAs[Int]("cell")}) — rebuild the index")
      }
      rows.toSeq.map(_.getAs[scala.collection.Seq[Double]]("centroid").toSeq)
    }
  }

  /** INCREMENTAL ingest into a persisted [[buildIvfIndex]] index: assign
    * `newRows` (id, embedding) to the EXISTING centroids (no refit) and
    * append them as an idempotent per-batch delta
    * (`indexDir/deltas/delta=<deltaId>/cell=<c>/…` — the
    * [[graft.streaming.CorpusIndex]] protocol: a replayed/retried batch id
    * OVERWRITES its own directory with identical content instead of
    * double-appending). Serving reads corpus ∪ deltas with the same cell
    * pruning; [[compactIvfDeltas]] folds accumulated deltas.
    *
    * A corpus that grows daily therefore costs one assignment pass per
    * batch instead of a full rebuild. The trade: appended data is
    * quantized by YESTERDAY'S centroids. Two guards keep that honest:
    *
    *  - geometry is REQUIRED (dim-validated appends only — a pre-geometry
    *    index must be rebuilt before it can grow);
    *  - a batch whose assignment is heavily SKEWED (max cell >
    *    `maxCellSkew` × the balanced share) is refused before writing:
    *    new data crowding into few cells means the distribution has
    *    drifted off the fitted quantizer — per-probe cost inflates and
    *    recall decays — so the right move is a refit
    *    ([[buildIvfIndex]]), not another delta.
    */
  def appendToIvfIndex(newRows: DataFrame, indexDir: String, deltaId: Long,
      maxCellSkew: Double = 8.0): Unit = {
    require(deltaId >= 0, s"deltaId must be >= 0 (got $deltaId): negative ids " +
      "are reserved for compacted bases")
    val spark = newRows.sparkSession
    val (dim, nlist, _) = readIvfGeometry(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"IVF index at $indexDir carries no _geometry row: appends cannot be " +
          "dim-validated against it — rebuild with buildIvfIndex first"))
    requireProbeDim(newRows.select(col("id").as("qid"), col("embedding")),
      dim, indexDir)
    // erased-id replay guard (graft.streaming.ErasedKeys, written by
    // IndexErase): an at-least-once upstream re-delivering an erased id
    // must not re-index it
    val guarded = graft.streaming.ErasedKeys.dropErased(
      newRows, indexDir, "nid", "id", "IVF delta append")
    val assigned = assignCells(
      guarded.select(col("id"), col("embedding")), centroidSeq(spark, indexDir))
      .select(col("id").as("nid"), toDouble(col("embedding")).as("ne"),
        norm2(toDouble(col("embedding"))).as("nn"), col("cell"))
    // skew gate BEFORE writing (a tiny (cell, count) aggregation — the
    // batch is scanned twice, the price of never committing a delta the
    // gate would then have to retract)
    val counts = assigned.groupBy(col("cell")).count().collect()
    val n = counts.map(_.getLong(1)).sum
    if (n == 0) return // empty append is a legal no-op
    val maxCell = counts.map(_.getLong(1)).max
    val balanced = math.max(1.0, n.toDouble / nlist)
    require(maxCell <= maxCellSkew * balanced,
      f"appendToIvfIndex($indexDir, delta=$deltaId): batch assignment is " +
        f"skewed — heaviest cell holds $maxCell of $n rows " +
        f"(${maxCell / balanced}%.1f× the balanced share, gate $maxCellSkew%.1f×). " +
        "The new data's distribution has drifted off the fitted quantizer; " +
        "REBUILD the index (buildIvfIndex) instead of appending, or raise " +
        "maxCellSkew if the skew is expected")
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/deltas/delta=$deltaId")
  }

  /** [[appendToIvfIndex]] for a [[buildIvfIndexSharded]] index: rows route
    * to shards by the SAME id-hash as the build, each shard's slice
    * appended to its own sub-index concurrently.
    */
  def appendToIvfIndexSharded(newRows: DataFrame, indexDir: String,
      deltaId: Long, maxCellSkew: Double = 8.0): Unit = {
    val spark = newRows.sparkSession
    val nShards = readSharding(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"$indexDir carries no _sharding row — append to a single index with " +
          "appendToIvfIndex, or build with buildIvfIndexSharded"))
    shardScatter(nShards) { sh =>
      appendToIvfIndex(
        newRows.where(pmod(xxhash64(col("id")), lit(nShards)) === sh),
        s"$indexDir/shard=$sh", deltaId, maxCellSkew)
    }
    ()
  }

  /** Delta subdirectories of an index component (sorted by id). */
  private[operators] def listDeltas(spark: org.apache.spark.sql.SparkSession,
      deltasDir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val p = new org.apache.hadoop.fs.Path(deltasDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("delta="))
      .map(d => d.getName.stripPrefix("delta=").toLong -> d)
      .sortBy(_._1)
  }

  /** Cell-pruned read of an index data dir plus its deltas (if any) —
    * the one read every serve path uses, so appended rows are found by
    * exactly the same partition-pruned plan as built rows.
    */
  private[operators] def readWithDeltas(spark: org.apache.spark.sql.SparkSession,
      dataDir: String, deltasDir: String, cells: Seq[Int],
      cols: Seq[String]): DataFrame = {
    val base = spark.read.parquet(dataDir)
      .where(col("cell").isin(cells: _*)).select(cols.map(col): _*)
    val deltas = listDeltas(spark, deltasDir)
    if (deltas.isEmpty) base
    else base.unionByName(
      spark.read.parquet(deltasDir)
        .where(col("cell").isin(cells: _*)).select(cols.map(col): _*))
  }

  /** Fold accumulated append deltas into one compacted base delta
    * (`delta=<min-1>`, a negative id below every existing one), preserving
    * the cell partitioning — the [[graft.streaming.CorpusIndex]]
    * compaction discipline: stage → promote → delete, so a crash at any
    * point leaves every row visible at least once (per-id duplicates
    * cannot arise: each delta holds distinct ingest batches). The NEWEST
    * non-negative delta is never folded (safe to run between a crashed
    * append and its idempotent retry). Returns folded delta count.
    */
  def compactIvfDeltas(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Int = foldCellDeltas(spark, s"$indexDir/deltas")

  private[operators] def foldCellDeltas(spark: org.apache.spark.sql.SparkSession,
      deltasDir: String): Int = {
    val deltas = listDeltas(spark, deltasDir)
    val newestBatch = deltas.map(_._1).filter(_ >= 0).maxOption
    val fold = deltas.filterNot(d => newestBatch.contains(d._1))
    if (fold.size <= 1) return 0
    val fs = new org.apache.hadoop.fs.Path(deltasDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newBase = deltas.map(_._1).min - 1
    val stage = new org.apache.hadoop.fs.Path(deltasDir, ".compact-stage")
    // basePath anchors partition discovery for the multi-root read: both
    // delta and cell resolve as partition columns; the fold drops delta
    // and keeps the cell layout
    spark.read.option("basePath", deltasDir).parquet(fold.map(_._2.toString): _*)
      .drop("delta")
      .write.mode("overwrite").partitionBy("cell").parquet(stage.toString)
    graft.streaming.FsOps.renameOrThrow(fs, stage,
      new org.apache.hadoop.fs.Path(deltasDir, s"delta=$newBase"))
    fold.foreach(d => graft.streaming.FsOps.deleteOrThrow(fs, d._2, recursive = true))
    fold.size
  }

  /** Query a [[buildIvfIndex]] index: rank each query's centroids, read
    * ONLY the union of probed cells' partitions (cell pruning reaches the
    * file listing — the scan never touches unprobed cells' files), then
    * the usual bucket join + top-k window.
    */
  /** `expectedDim`: for indexes built before the `_geometry` row existed —
    * pass the index's known dimension to restore the wrong-dim-probe
    * refusal (0 = unknown: a pre-geometry index is served with a loud
    * warning and NO dim validation, the EmbeddingIndex compatibility rule).
    * When the index carries a geometry row, it is authoritative and a
    * non-zero `expectedDim` must agree with it.
    */
  def ivfIndexQuery(queries: DataFrame, indexDir: String, k: Int,
      nprobe: Int = 4, expectedDim: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    // resolve the dimension the probe must match; the CHECK itself runs on
    // the collected probe rows below — zero extra jobs (the serve already
    // collects them), where a separate aggregation would bill every serve
    // batch one more round-trip
    val indexDim: Option[Int] = readIvfGeometry(spark, indexDir) match {
      case Some((dim, _, _)) =>
        require(expectedDim == 0 || expectedDim == dim,
          s"index at $indexDir carries geometry dim=$dim but the caller " +
            s"expected dim=$expectedDim — one of the two is the wrong index")
        Some(dim)
      case None if expectedDim > 0 => Some(expectedDim)
      case None =>
        System.err.println(s"[graft] WARNING: IVF index $indexDir predates " +
          "the _geometry row and no expectedDim was passed — a wrong-dim " +
          "probe against it returns EMPTY results with no error; rebuild " +
          "with buildIvfIndex or pass expectedDim")
        None
    }
    val centDf = broadcast(IndexMeta.cachedTable(spark, s"$indexDir/centroids"))
    val qe = queries.select(col("qid"), toDouble(col("embedding")).as("qe"),
      norm2(toDouble(col("embedding"))).as("qn"))
    // the probe plan runs ONCE: its rows (query batch × nprobe — small by
    // the serving contract) are collected, the cell union drives a
    // PARTITION-PRUNED read of just those cell directories, and the same
    // collected rows become the broadcast join side
    val probePlan = rankedProbes(qe, centDf, nprobe)
    val probeRows = probePlan.collect().toSeq
    // wrong-dim/NULL probes survive to this point (their cdist is NULL but
    // the rank window still emits rows), so the collected rows carry every
    // query's vector — validate here, before any cell is read
    indexDim.foreach(d => validateProbeRows(probeRows, d, indexDir))
    val cells = probeRows.map(_.getAs[Int]("cell")).distinct
    // LOCAL relation, not parallelize: the rows are already on the driver
    // and only feed a broadcast — a LocalTableScan builds that broadcast
    // driver-side with zero tasks, where an RDD scan billed every serve a
    // defaultParallelism-wide stage
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probePlan.schema)
    // corpus ∪ append deltas (incremental ingest), both cell-pruned — an
    // appended row is served by exactly the plan a built row gets
    val assigned = readWithDeltas(spark, s"$indexDir/corpus",
      s"$indexDir/deltas", cells, Seq("nid", "ne", "nn", "cell"))
    val sims = assigned.join(broadcast(probes), Seq("cell"))
      .select(col("qid"), col("nid"),
        (dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("sim"))
    topK(sims, k)
  }

  /** Build a SHARDED IVF index: `nShards` independent [[buildIvfIndex]]
    * instances (one coarse quantizer each) under `indexDir/shard=<s>/`,
    * rows routed by id-hash. This is the scale path past [[nlistFor]]'s
    * single-quantizer ceiling (4096 cells × 4096 target rows ≈ 16M rows):
    * a quantizer's KMeans fit cost and centroid table are per-shard
    * constants, so capacity scales by adding shards instead of inflating
    * one fit — the FAISS/ScaNN sharded-serving pattern.
    *
    * Id-HASH routing (not range/ingest order) keeps every shard a uniform
    * draw of the corpus, so each shard's quantizer sees the same embedding
    * distribution and per-shard recall matches single-index recall — a
    * time- or source-clustered split would give each shard a biased region
    * and degrade the merge.
    *
    * `nlist = 0` auto-sizes each shard's cells to ITS row count.
    * Per-shard seeds differ so equal-sized shards don't fit identical
    * centroid initializations.
    */
  def buildIvfIndexSharded(corpus: DataFrame, indexDir: String, nShards: Int,
      nlist: Int = 0, seed: Long = 42L, maxFitRows: Int = 100000): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // fail fast, BEFORE any shard is written, if some hash residue class
    // would be empty (guaranteed when rows < nShards): an empty shard's
    // build dies mid-loop with an unhelpful empty-head error, stranding a
    // half-built index. One count pass over (id) only.
    val present = corpus
      .groupBy(pmod(xxhash64(col("id")), lit(nShards)).as("sh")).count()
      .collect().map(_.getLong(0)).toSet
    val missing = (0L until nShards.toLong).filterNot(present.contains)
    require(missing.isEmpty,
      s"buildIvfIndexSharded(nShards=$nShards): shard(s) " +
        s"${missing.take(5).mkString(", ")} would be EMPTY (corpus has only " +
        s"${present.size} non-empty hash classes) — the corpus is too small " +
        "for this shard count; reduce nShards (a shard should hold millions " +
        "of rows, not thousands)")
    // CONCURRENT shard builds (the serve-side shardScatter applied to the
    // build): each shard's KMeans fit has driver-side phases (collects,
    // model updates) that leave the cluster idle — a sequential loop
    // serializes those gaps into nShards × fit-latency, while concurrent
    // fits overlap each shard's driver phase with the others' cluster
    // work. Shards write disjoint directories, so the builds compose.
    shardScatter(nShards) { sh =>
      buildIvfIndex(
        corpus.where(pmod(xxhash64(col("id")), lit(nShards)) === sh),
        s"$indexDir/shard=$sh", nlist, seed + sh, maxFitRows)
    }
    // the _sharding row is the COMMIT point, written after every shard is
    // complete: a crash mid-build leaves a directory ivfIndexQuerySharded
    // refuses (no _sharding row), never one it serves partially
    corpus.sparkSession.createDataFrame(Seq(Tuple1(nShards))).toDF("n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_sharding")
  }

  /** The sharded index's shard count (None: not a sharded index). */
  def readSharding(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/_sharding")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexMeta.cached(spark, s"$indexDir/_sharding") {
      if (!fs.exists(p)) None
      else Some(spark.read.parquet(s"$indexDir/_sharding").head()
        .getAs[Int]("n_shards"))
    }
  }

  /** Build a ROUTED sharded IVF index: a top-level KMeans quantizer with
    * `nShards` cells partitions the embedding SPACE (not the id space) —
    * rows route to the shard of their nearest top-level centroid, each
    * shard builds its own [[buildIvfIndex]] sub-index, and the router
    * centroids persist under `_router/`. This is the two-level
    * inverted-multi-index shape (FAISS IMI): where [[buildIvfIndexSharded]]
    * (id-hash) must scatter EVERY query to EVERY shard (each shard is a
    * uniform corpus draw, so the true neighbor is equally likely
    * anywhere), a routed index serves with `routeShards ≪ nShards` probes
    * ([[ivfIndexQueryRouted]]) — per-query serve cost drops from
    * O(nShards·nprobe·cellRows) to O(routeShards·nprobe·cellRows), the
    * escape from the measured linear scatter width. The trade is recall
    * at shard Voronoi boundaries, recovered by routeShards > 1 exactly
    * like nprobe recovers cell-boundary recall.
    *
    * A top-level cell that attracts no rows fails the build fast (same
    * rule as the hash-sharded empty-residue check): lower nShards.
    */
  def buildIvfIndexRouted(corpus: DataFrame, indexDir: String, nShards: Int,
      nlist: Int = 0, seed: Long = 42L, maxFitRows: Int = 100000): Unit = {
    require(nShards > 1, s"nShards must be > 1 for a routed index, got $nShards")
    val spark = corpus.sparkSession
    val routerCents = fitQuantizer(
      fitSample(corpus.select(col("id"), col("embedding")), maxFitRows),
      "embedding", nShards, seed)
    val routed = assignCells(corpus.select(col("id"), col("embedding")), routerCents)
      .withColumnRenamed("cell", "__shard")
    val present = routed.groupBy(col("__shard")).count()
      .collect().map(_.getInt(0)).toSet
    val missing = (0 until nShards).filterNot(present.contains)
    require(missing.isEmpty,
      s"buildIvfIndexRouted(nShards=$nShards): router cell(s) " +
        s"${missing.take(5).mkString(", ")} attracted no rows — the corpus " +
        "does not support this many space shards; reduce nShards")
    shardScatter(nShards) { sh =>
      buildIvfIndex(
        routed.where(col("__shard") === sh).select(col("id"), col("embedding")),
        s"$indexDir/shard=$sh", nlist, seed + sh, maxFitRows)
    }
    spark.createDataFrame(routerCents.zipWithIndex.map { case (c, i) => (i, c) })
      .toDF("shard", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_router")
    // the _sharding row stays the commit point, written after router AND
    // every shard are complete
    spark.createDataFrame(Seq(Tuple1(nShards))).toDF("n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_sharding")
  }

  /** [[appendToIvfIndex]] for a [[buildIvfIndexRouted]] index: rows route
    * to shards by the persisted `_router` (the SAME assignment the build
    * used — content, not id-hash), then append to each target shard's
    * sub-index. Drift note: a batch from a region the router has no
    * centroid near assigns noisily among far shards and concentrates in
    * few cells of each — the per-shard skew gate fires exactly then, and
    * the remedy is [[rebalanceRouted]] (refit the router on the current
    * corpus) rather than raising the gate.
    */
  def appendToIvfIndexRouted(newRows: DataFrame, indexDir: String,
      deltaId: Long, maxCellSkew: Double = 8.0): Unit = {
    val spark = newRows.sparkSession
    val nShards = readSharding(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"$indexDir carries no _sharding row — not a sharded IVF index"))
    requireRouter(spark, indexDir, "appendToIvfIndexSharded", "buildIvfIndexRouted")
    val cents = routerCentroidSeq(spark, indexDir)
    require(cents.size == nShards,
      s"$indexDir router carries ${cents.size} centroids for $nShards shards")
    val routed = assignCells(newRows.select(col("id"), col("embedding")), cents)
      .withColumnRenamed("cell", "__shard").persist()
    try {
      val present = routed.groupBy(col("__shard")).count()
        .collect().map(_.getInt(0)).sorted
      shardScatter(present.length) { i =>
        val sh = present(i)
        appendToIvfIndex(
          routed.where(col("__shard") === sh).select(col("id"), col("embedding")),
          s"$indexDir/shard=$sh", deltaId, maxCellSkew)
      }
      ()
    } finally { routed.unpersist(); () }
  }

  /** The `_router` centroid table as a shard-indexed sequence, validated
    * dense (the [[centroidSeq]] rule applied to the top level).
    */
  private[operators] def routerCentroidSeq(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Seq[Seq[Double]] = {
    val rows = IndexMeta.cachedTable(spark, s"$indexDir/_router")
      .orderBy(col("shard")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getAs[Int]("shard") == i,
        s"router table at $indexDir is not a dense 0..n-1 shard range " +
          s"(position $i holds shard ${r.getAs[Int]("shard")}) — rebuild the index")
    }
    rows.toSeq.map(_.getAs[scala.collection.Seq[Double]]("centroid").toSeq)
  }

  /** Outcome of [[rebalanceRouted]]: rows whose shard changed under the
    * fresh router (the shuffle volume), the corpus total, and how many
    * shard sub-indexes were rebuilt (shards with unchanged membership are
    * untouched — not read, not rewritten).
    */
  final case class RebalanceStats(nShards: Int, rowsMoved: Long,
      rowsTotal: Long, shardsRebuilt: Int)

  /** REFIT a routed index's top-level router on the CURRENT corpus and
    * rebalance shard membership (r13 verdict ask #6): drift-skewed
    * appends concentrate new rows in few shards (the
    * [[appendToIvfIndex]] skew gate's refusal names a refit as the
    * remedy) — previously that refit was a full offline rebuild. This
    * pass:
    *
    *  1. reads the current rows (corpus + deltas, all shards) once;
    *  2. fits a FRESH router on a bounded sample of them;
    *  3. computes every row's new shard; shards whose membership is
    *     unchanged are NOT touched — only rows whose shard changed move,
    *     and only shards with any arrival/departure are rebuilt (their
    *     sub-quantizer refits on the new membership, which is exactly
    *     what the drifted region needs);
    *  4. stages the rebuilt shards + the new `_router` invisibly, then
    *     swaps via the Compact-shaped intent → promote → commit-marker
    *     protocol under the maintenance [[graft.streaming.LockProvider]]:
    *     a crash at any point rolls back to the complete OLD index (no
    *     marker) or forward to the complete NEW one (marker present) on
    *     the next call — serves never resolve a half-rebalanced index
    *     across a crash. Serves during the staging phase see the old
    *     index wholly; the promote window itself is a handful of renames.
    *
    * Full-probe serves (`routeShards = nShards`) return bit-identical
    * results before and after — membership is a partition of the same
    * rows, and the scatter-gather merge is exact (RoutedIvfSpec pins it).
    */
  def rebalanceRouted(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      seed: Long = 43L, maxFitRows: Int = 100000,
      lock: graft.streaming.LockProvider = graft.streaming.FsLeaseLock,
      leaseMs: Long = 15L * 60 * 1000): RebalanceStats = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    lock.withLock(fs, root, leaseMs) {
      recoverRebalance(spark, indexDir)
      val nShards = readSharding(spark, indexDir).getOrElse(
        throw new IllegalStateException(
          s"$indexDir carries no _sharding row — not a sharded IVF index"))
      requireRouter(spark, indexDir, "ivfIndexQuerySharded", "buildIvfIndexRouted")
      // 1. current rows, with their current shard (corpus + deltas — read
      // separately: their partition depths differ, a joint read trips
      // Spark's conflicting-directory-structures check)
      val cur = (0 until nShards).map { sh =>
        val deltasDir = new org.apache.hadoop.fs.Path(s"$indexDir/shard=$sh/deltas")
        val c = spark.read.parquet(s"$indexDir/shard=$sh/corpus")
          .select(col("nid").as("id"), col("ne").as("embedding"))
        val both =
          if (fs.exists(deltasDir))
            c.unionByName(spark.read.parquet(deltasDir.toString)
              .select(col("nid").as("id"), col("ne").as("embedding")))
          else c
        both.withColumn("__old", lit(sh))
      }.reduce(_ unionByName _)
      // 2. fresh router on the current distribution
      val newCents = fitQuantizer(fitSample(cur, maxFitRows),
        "embedding", nShards, seed)
      // 3. new assignment; persist — membership feeds counts AND rebuilds
      val assigned = assignCells(cur, newCents)
        .withColumnRenamed("cell", "__new").persist()
      try {
        val byPair = assigned.groupBy(col("__old"), col("__new")).count().collect()
        val total = byPair.map(_.getLong(2)).sum
        val moved = byPair.filter(r => r.getInt(0) != r.getInt(1))
          .map(_.getLong(2)).sum
        val newCounts = (0 until nShards).map(sh =>
          sh -> byPair.filter(_.getInt(1) == sh).map(_.getLong(2)).sum).toMap
        val empty = (0 until nShards).filter(newCounts(_) == 0L)
        require(empty.isEmpty,
          s"rebalanceRouted($indexDir): fresh router cell(s) " +
            s"${empty.take(5).mkString(", ")} attract no rows — the corpus no " +
            "longer supports this shard count; rebuild with fewer shards")
        val changed = (0 until nShards).filter(sh =>
          byPair.exists(r => r.getLong(2) > 0 &&
            ((r.getInt(0) == sh) != (r.getInt(1) == sh))))
        if (changed.isEmpty) return RebalanceStats(nShards, 0L, total, 0)
        // 4a. stage: rebuilt sub-indexes for changed shards + new router
        val stage = s"$indexDir/.rebalance-stage"
        graft.streaming.FsOps.deleteOrThrow(fs,
          new org.apache.hadoop.fs.Path(stage), recursive = true)
        shardScatter(changed.size) { i =>
          val sh = changed(i)
          buildIvfIndex(
            assigned.where(col("__new") === sh).select(col("id"), col("embedding")),
            s"$stage/shard=$sh", nlist = 0, seed = seed + sh,
            maxFitRows = maxFitRows)
        }
        spark.createDataFrame(newCents.zipWithIndex.map { case (c, i) => (i, c) })
          .toDF("shard", "centroid")
          .coalesce(1).write.mode("overwrite").parquet(s"$stage/_router")
        // 4b. intent (write-ahead): what the promote will swap
        val hconf = spark.sparkContext.hadoopConfiguration
        val items = changed.map(sh => s"shard=$sh") :+ "_router"
        graft.streaming.FsOps.atomicWrite(hconf, fs,
          new org.apache.hadoop.fs.Path(indexDir, "_rebalance-intent"),
          items.mkString("\n").getBytes("UTF-8"))
        // 4c. promote: old aside, staged in (asides survive until the
        // marker commits, so roll-back can always restore the old index)
        items.foreach { name =>
          val live = new org.apache.hadoop.fs.Path(indexDir, name)
          val aside = new org.apache.hadoop.fs.Path(indexDir, s".rebalance-old-$name")
          graft.streaming.FsOps.deleteOrThrow(fs, aside, recursive = true)
          graft.streaming.FsOps.renameOrThrow(fs, live, aside)
          graft.streaming.FsOps.renameOrThrow(
            fs, new org.apache.hadoop.fs.Path(s"$stage/$name"), live)
        }
        // 4d. commit marker, then cleanup
        fs.create(new org.apache.hadoop.fs.Path(indexDir, "_rebalance-committed"),
          true).close()
        items.foreach(name => graft.streaming.FsOps.deleteOrThrow(fs,
          new org.apache.hadoop.fs.Path(indexDir, s".rebalance-old-$name"),
          recursive = true))
        graft.streaming.FsOps.deleteOrThrow(fs,
          new org.apache.hadoop.fs.Path(stage), recursive = true)
        graft.streaming.FsOps.deleteOrThrow(fs,
          new org.apache.hadoop.fs.Path(indexDir, "_rebalance-intent"),
          recursive = false)
        graft.streaming.FsOps.deleteOrThrow(fs,
          new org.apache.hadoop.fs.Path(indexDir, "_rebalance-committed"),
          recursive = false)
        RebalanceStats(nShards, moved, total, changed.size)
      } finally { assigned.unpersist(); () }
    }
  }

  /** Complete an interrupted [[rebalanceRouted]]: commit marker present →
    * roll FORWARD (finish the cleanup — the new index is fully promoted);
    * intent but no marker → roll BACK (restore every aside, so serves
    * resolve the complete OLD index); neither → sweep stray stage dirs.
    */
  private def recoverRebalance(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val intent = new org.apache.hadoop.fs.Path(indexDir, "_rebalance-intent")
    val marker = new org.apache.hadoop.fs.Path(indexDir, "_rebalance-committed")
    val asides = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(".rebalance-old-"))
    if (fs.exists(marker)) {
      asides.foreach(a =>
        graft.streaming.FsOps.deleteOrThrow(fs, a, recursive = true))
      graft.streaming.FsOps.deleteOrThrow(fs, intent, recursive = false)
      graft.streaming.FsOps.deleteOrThrow(fs, marker, recursive = false)
    } else if (fs.exists(intent)) {
      asides.foreach { a =>
        val live = new org.apache.hadoop.fs.Path(indexDir,
          a.getName.stripPrefix(".rebalance-old-"))
        graft.streaming.FsOps.deleteOrThrow(fs, live, recursive = true)
        graft.streaming.FsOps.renameOrThrow(fs, a, live)
      }
      graft.streaming.FsOps.deleteOrThrow(fs, intent, recursive = false)
    }
    graft.streaming.FsOps.deleteOrThrow(fs,
      new org.apache.hadoop.fs.Path(indexDir, ".rebalance-stage"), recursive = true)
  }

  /** Serve a [[buildIvfIndexRouted]] index probing each query's
    * `routeShards` nearest space shards only. `routeShards >= nShards`
    * degenerates to the full scatter and returns results identical to
    * [[ivfIndexQuerySharded]] on the same index (pinned in
    * IncrementalIvfSpec) — the router is a cost dial, not a different
    * answer.
    */
  def ivfIndexQueryRouted(queries: DataFrame, indexDir: String, k: Int,
      nprobe: Int = 4, routeShards: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val nShards = readSharding(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"$indexDir carries no _sharding row — not a sharded IVF index"))
    requireRouter(spark, indexDir, "ivfIndexQuerySharded", "buildIvfIndexRouted")
    val r = math.min(math.max(1, routeShards), nShards)
    if (r == nShards) return ivfIndexQuerySharded(queries, indexDir, k, nprobe)
    val byShard = routeQueries(queries, indexDir, r)
    // empty probe batch = legal empty serve (the requireProbeDim rule):
    // shard 0's serve with the empty batch yields the right schema
    if (byShard.isEmpty)
      return ivfIndexQuery(queries, s"$indexDir/shard=0", k, nprobe)
    val frames = shardScatter(byShard.size) { i =>
      val (sh, qids) = byShard(i)
      ivfIndexQuery(queries.where(col("qid").isInCollection(qids)),
        s"$indexDir/shard=$sh", k, nprobe)
    }
    frames.reduce(_ unionByName _).transform(topK(_, k))
  }

  /** Rank the persisted `_router` centroids per query and return each
    * shard's routed qid list — the (qid, shard) routing table is |Q|·r
    * rows, driver-side by the serving contract, like the per-shard probe
    * plans it gates. Shared by the IVF and IVF-PQ routed serves.
    */
  private[operators] def routeQueries(queries: DataFrame, indexDir: String,
      r: Int): Seq[(Int, Seq[Any])] = {
    val spark = queries.sparkSession
    val routerDf = broadcast(IndexMeta.cachedTable(spark, s"$indexDir/_router"))
    val wShard = Window.partitionBy(col("qid")).orderBy(col("rdist"), col("shard"))
    val routing = queries
      .select(col("qid"), toDouble(col("embedding")).as("qe"))
      .crossJoin(routerDf)
      .withColumn("rdist", l2Distance(col("qe"), col("centroid")))
      .withColumn("rrn", row_number().over(wShard))
      .where(col("rrn") <= r)
      .select(col("qid"), col("shard"))
      .collect()
    routing.groupBy(_.getAs[Int]("shard")).view
      .mapValues(_.map(_.getAs[Any]("qid")).toSeq).toSeq.sortBy(_._1)
  }

  /** Require the `_router` centroids a routed serve needs (an id-hash
    * sharded index has no meaningful shard routing — every shard is a
    * uniform corpus draw, so skipping any loses recall proportionally).
    */
  private[operators] def requireRouter(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, scatterServe: String, routedBuild: String): Unit = {
    val rp = new org.apache.hadoop.fs.Path(s"$indexDir/_router")
    require(rp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(rp),
      s"$indexDir carries no _router centroids — an id-hash sharded index " +
        "has no meaningful shard routing (every shard is a uniform corpus " +
        "draw; skipping any loses recall proportionally): serve it with " +
        s"$scatterServe, or rebuild with $routedBuild")
  }

  /** Serve a [[buildIvfIndexSharded]] index: scatter the query batch to
    * every shard ([[ivfIndexQuery]] — partition-pruned nprobe cells per
    * shard, each shard's own geometry validated), gather per-shard top-k,
    * merge to the global top-k. Correct because each corpus row lives in
    * exactly one shard: the global top-k is a subset of the union of
    * per-shard top-ks. Per-query work is O(nShards · nprobe · cellRows) —
    * the scatter width is the price of unbounded capacity; `nprobe` keeps
    * its per-shard meaning, so recall per shard matches the single-index
    * measurement (AnnRecall tier).
    */
  def ivfIndexQuerySharded(queries: DataFrame, indexDir: String, k: Int,
      nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val nShards = readSharding(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"$indexDir carries no _sharding row — not a sharded IVF index " +
          "(serve a single index with ivfIndexQuery, or rebuild with " +
          "buildIvfIndexSharded)"))
    // scatter CONCURRENTLY: each shard's plan-time work (centroid read +
    // probe-plan collect — small driver-side jobs; Spark job submission is
    // thread-safe) would otherwise serialize into nShards × collect-latency
    // before the merged scan job even starts. The heavy cell scans stay in
    // ONE job: the per-shard frames are lazy and execute together under
    // the final union+window. (Per-shard dim validation is free — it runs
    // on each shard's already-collected probe rows.)
    shardScatter(nShards)(sh =>
      ivfIndexQuery(queries, s"$indexDir/shard=$sh", k, nprobe))
      .reduce(_ unionByName _)
      .transform(topK(_, k))
  }

  /** Run `f` for every shard id on a bounded thread pool, preserving shard
    * order in the result (order only matters for plan determinism — the
    * final top-k window re-ranks). Shared by the IVF and IVF-PQ sharded
    * serves.
    */
  private[graft] def shardScatter[T](nShards: Int, maxThreads: Int = 8)(
      f: Int => T): Seq[T] = {
    if (nShards == 0) return Seq.empty // a 0-thread pool would throw
    if (nShards == 1) return Seq(f(0))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(nShards, maxThreads))
    // await in COMPLETION order (not submission order): waiting on shard 0
    // first would sit out its full runtime before noticing shard 3 already
    // failed — the failure must cancel the still-running shards promptly,
    // not after the slowest one finishes
    val ecs = new java.util.concurrent.ExecutorCompletionService[(Int, T)](pool)
    try {
      (0 until nShards).foreach { sh =>
        ecs.submit(new java.util.concurrent.Callable[(Int, T)] {
          def call(): (Int, T) = (sh, f(sh))
        })
        ()
      }
      val results = new Array[Any](nShards)
      var done = 0
      while (done < nShards) {
        // unwrap ExecutionException so callers see the shard's own error
        // (e.g. the geometry-mismatch IllegalArgumentException), not a
        // concurrency wrapper around it
        val (sh, r) =
          try ecs.take().get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
        results(sh) = r
        done += 1
      }
      results.toSeq.map(_.asInstanceOf[T])
    } catch { case t: Throwable =>
      // a failed scatter must not leak still-running shard work (each
      // shard's callable drives Spark jobs): cancel queued tasks and
      // interrupt running ones — Spark cancels a job whose submitting
      // thread is interrupted mid-collect — before rethrowing
      pool.shutdownNow()
      throw t
    } finally { pool.shutdown() }
  }

  /** SemDeDup-style semantic near-duplicate detection (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with a KMeans coarse
    * quantizer (fit on a bounded sample, same discipline as [[ivfAnn]]),
    * then compare pairs only NEAR each other inside a cluster — never
    * all-pairs anywhere.
    *
    * Two bounds make the cost linear in corpus size, empirically forced by
    * the round-6 sf1 run (fixed 8-cell quantization measured 39× cost for
    * 10× data — within-cell all-pairs is quadratic in cell size, and cells
    * grow with the corpus when k is fixed):
    *
    *  1. **Auto-sized quantizer.** When `nClusters = 0` (the default), k is
    *     ⌈n / targetCellSize⌉ clamped to [2, maxClusters] — cell size tracks
    *     `targetCellSize` instead of n/k growing with the corpus. The count
    *     used for sizing is a metadata-cheap single-column pass.
    *  2. **Centroid-distance rank banding.** Within each cell, rows are
    *     ranked by (distance-to-own-centroid, id) and banded `targetCellSize`
    *     ranks wide; pairs are generated within a band and across ADJACENT
    *     bands only. Near-identical embeddings have near-identical centroid
    *     distance, so true duplicates land in the same or neighboring band.
    *     Cells up to 2× the band width are covered EXACTLY (every pair
    *     generated); beyond that the comparison is rank-local. This caps
    *     per-row work at 2·targetCellSize pairs — a skewed or
    *     over-target cell (k is clamped at `maxClusters`; KMeans cells are
    *     never uniform) degrades recall gracefully instead of going
    *     quadratic, so total cost is O(n · targetCellSize) regardless of
    *     corpus size or skew.
    *
    * Approximation contract: every emitted pair is a TRUE cosine≥threshold
    * pair (the verify is exact); pairs split across clusters or >1 band
    * apart are missed — recall rises with larger `targetCellSize` and with
    * duplicate pairs' tendency to co-locate (near-identical embeddings land
    * in the same cell except on a Voronoi boundary). Pairs whose cosine
    * clears `threshold` are semantic duplicates (keep-smallest-id policy
    * composes downstream, as with the lexical dedup operators).
    */
  def semanticNearDups(docs: DataFrame, idCol: String, embCol: String,
      threshold: Double = 0.9, nClusters: Int = 0, seed: Long = 42L,
      maxFitRows: Int = 100000, roundScale: Int = 4,
      targetCellSize: Int = 256, maxClusters: Int = 1024,
      quantizerIters: Int = 8): DataFrame = {
    val vec = docs.select(col(idCol).as("id"), toDouble(col(embCol)).as("e"))
    val k =
      if (nClusters > 0) nClusters
      else {
        val n = vec.count()
        // beyond maxClusters·targetCellSize rows, cells exceed the target
        // and banding (bound 2) carries the linear-cost guarantee alone;
        // a bigger k would only slow the quantizer fit (O(sample·k·dim))
        math.max(2L, math.min((n + targetCellSize - 1) / targetCellSize,
          maxClusters.toLong)).toInt
      }
    // coarse-quantizer discipline: cells only need to co-locate near-twins,
    // not converge — few Lloyd iterations give the same recall at a
    // fraction of the fit cost (which is O(sample·k·iters·dim) and k
    // autoscales with the corpus until maxClusters)
    val cents = fitQuantizer(fitSample(vec, maxFitRows), "e", k, seed,
      quantizerIters)
    // distance to OWN centroid via a cell-indexed literal (≤ maxClusters ×
    // dim doubles ≈ 0.5 MB) — no join, so the operator's only join stays
    // the banded pair join below
    val centLit = typedLit(cents)
    val wRank = Window.partitionBy(col("cell"))
      .orderBy(col("cdist"), col("id"))
    val assigned = vec
      .withColumn("cell", graft.functions.NearestCell.nearest_cell(col("e"), cents))
      .select(col("id"), col("e"), norm2(col("e")).as("nrm"), col("cell"))
      .withColumn("cdist", l2Distance(col("e"), element_at(centLit, col("cell") + 1)))
      .withColumn("band",
        ((row_number().over(wRank) - 1) / targetCellSize).cast("int"))
      .select(col("cell"), col("band"), col("id"), col("e"), col("nrm"))
    val a = assigned.select(col("cell"), col("band"), col("id").as("id_a"),
      col("e").as("ea"), col("nrm").as("na"))
    // the b side carries each row twice: once for its home band (paired
    // against same-band rows, id-ordered so each pair appears once) and
    // once for band+1 (paired against the next band's rows — exactly one
    // orientation exists, so no id constraint and no duplicates)
    val b = assigned
      .withColumn("__probe", explode(array(
        struct(col("band").as("band"), lit(true).as("home")),
        struct((col("band") + 1).as("band"), lit(false).as("home")))))
      .select(col("cell"), col("__probe.band").as("band"),
        col("__probe.home").as("home"), col("id").as("id_b"),
        col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("cell", "band"))
      .where(!col("home") || col("id_a") < col("id_b"))
      .where(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), roundScale).as("cos"))
      .where(col("cos") >= threshold)
  }
}
