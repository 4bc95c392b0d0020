package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PqFunctions.l2_normalize
import graft.functions.SqFunctions
import graft.functions.SqFunctions.Sq8Grid
import graft.functions.VectorFunctions.{l2Distance, norm2, toDouble}

/** SQ8 scalar-quantized ANN: the scan-tier memory dial between full
  * precision (8 bytes/dim) and PQ (m bytes/vector) — per-dimension byte
  * codes at 1 byte/dim with an exact-cosine rerank, so the answer contract
  * matches [[Similarity.bruteForceKnn]] exactly like every other ANN path.
  *
  * Why this tier exists at 100 TB: the ADC scan reads 8× fewer bytes than
  * the double-array corpus while keeping per-dimension resolution PQ
  * trades away — recall at the scan tier is near-exact, so `refine` and
  * the band stay small (the rerank band is CLOSED-FORM here, ½·√Σscale²,
  * not a sampled p95: SQ8's worst-case ADC error for unit queries is an
  * algebraic bound, no distortion measurement needed).
  *
  * Shares [[PqIndex.bandCut]]/[[PqIndex.rerank]] — one candidate-cut
  * discipline across the compressed tiers.
  */
object SqAnn {

  /** Per-dimension grid from a bounded sample of NORMALIZED vectors:
    * off_d = min_d, scale_d = (max_d − min_d)/255. Values outside the
    * sample's range saturate at encode (never wrap); a constant dimension
    * gets a degenerate-safe scale.
    */
  def fitGrid(corpus: DataFrame, embCol: String = "embedding",
      maxFitRows: Int = 100000): Sq8Grid = {
    // hash-ordered sample (the fitSample discipline), NOT an ingest-order
    // .limit prefix: a corpus written sorted/clustered would fit a grid
    // spanning only the prefix's per-dim range, everything else would
    // saturate at encode, and the saturated ADC error exceeds the
    // closed-form band — silently voiding the rerank-cut guarantee.
    //
    // The min/max itself is a DISTRIBUTED aggregation (r11 verdict ask #4):
    // posexplode → hash-agg by dimension index runs with map-side partial
    // aggregation over ≤ dim groups per task, so the shuffle is dim ×
    // partitions rows and the driver receives exactly `dim` rows — where
    // the old form collected maxFitRows FULL vectors (~600 MB at dim 768)
    // to fold on one core.
    val sampled = Similarity.fitSample(corpus, maxFitRows)
      .select(l2_normalize(col(embCol)).as("e"))
      .where(col("e").isNotNull)
    // EMPTY arrays are invisible to posexplode (no positions, so the
    // per-dim count check below can't see them) — refuse them explicitly,
    // keeping the old per-row size refusal's coverage for the degenerate
    // input that would otherwise be silently mis-encoded
    val emptyCnt = sampled.where(size(col("e")) === 0).limit(1).count()
    require(emptyCnt == 0,
      "SQ8 fit: sample contains zero-length embedding(s) — filter or " +
        "re-embed them before fitting")
    val stats = sampled
      .select(posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("pos")
      // Spark's max() orders NaN ABOVE every double — one NaN value would
      // make hi (hence scale and band) NaN and silently void the rerank-cut
      // guarantee for that dimension. NaN embeddings are garbage input
      // (they NaN through every similarity expression too): count them in
      // the same pass and refuse loudly below, keeping the grid finite.
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"),
        count(when(isnan(col("v")), lit(1))).as("nans"))
      .collect()
    require(stats.nonEmpty, "SQ8 fit: empty corpus")
    val nanCnt = stats.map(_.getAs[Long]("nans")).sum
    // scope honesty: this guards the FIT SAMPLE (maxFitRows) — a NaN row
    // outside the sample still encodes to meaningless bytes at build time,
    // like a NaN embedding NaNs through every other ANN tier's cosine.
    // Validate embeddings at ingest; this refusal catches the common case
    // (systematic NaNs hit the uniform sample with near-certainty).
    require(nanCnt == 0,
      s"SQ8 fit: sample contains $nanCnt NaN embedding value(s) — a NaN " +
        "dimension makes the quantization grid (and its error band) NaN, " +
        "voiding the rerank-cut guarantee; filter or re-embed those rows")
    val dim = stats.length
    // equal per-dimension counts ⇔ every sampled vector has exactly `dim`
    // entries (a short vector under-counts its missing trailing dims, a
    // long one adds positions) — the ragged refusal, now provable from the
    // same pass
    val counts = stats.map(_.getAs[Long]("n")).distinct
    require(counts.size == 1,
      s"SQ8 fit: ragged embeddings (per-dim sample counts ${counts.min}..${counts.max})")
    val lo = new Array[Double](dim)
    val hi = new Array[Double](dim)
    stats.foreach { r =>
      val p = r.getAs[Int]("pos")
      lo(p) = r.getAs[Double]("lo")
      hi(p) = r.getAs[Double]("hi")
    }
    val scales = Array.tabulate(dim) { i =>
      val s = (hi(i) - lo(i)) / 255.0
      if (s > 0) s else 1e-12 // constant dim: every value encodes to byte 0
    }
    new Sq8Grid(lo, scales)
  }

  /** Flat SQ8 + exact rerank: byte-code the corpus map-side (codegen'd,
    * no shuffle), ADC-scan against broadcast normalized queries, band-cut,
    * rerank the sliver with exact cosine. Same plan shape as
    * [[PqIndex.pqAnn]]; only the code width and the band change.
    */
  def sq8Ann(queries: DataFrame, corpus: DataFrame, k: Int,
      refine: Int = 4, maxFitRows: Int = 100000, bandCap: Int = 32): DataFrame = {
    val grid = fitGrid(corpus, "embedding", maxFitRows)
    val codes = corpus.select(col("id").as("nid"),
      SqFunctions.sq8Encode(l2_normalize(col("embedding")), grid).as("code"))
    val qTab = broadcast(queries.select(col("qid"),
      l2_normalize(col("embedding")).as("qn8")))
    val adc = codes.join(qTab)
      .select(col("qid"), col("nid"),
        SqFunctions.sq8Adc(col("code"), col("qn8"), grid).as("adc"))
    PqIndex.rerank(PqIndex.bandCut(adc, k, refine, grid.band, bandCap),
      queries, corpus, k)
  }

  /** Build and persist an IVF-SQ8 index — the [[PqIndex.buildPqIvfIndex]]
    * layout with byte codes instead of PQ codes:
    *
    *  - `centroids/` — coarse cell centroids (tiny);
    *  - `sqmeta/` — one row: (offsets, scales, band, dim, nlist), the
    *    geometry/commit point, written LAST (delete-first rebuild
    *    discipline — a crash mid-rebuild leaves a loud missing-path, never
    *    old geometry certifying new codes);
    *  - `codes/` — (nid, code) partitioned by cell: the 1-byte/dim scan
    *    tier (8× fewer bytes than the double-array corpus);
    *  - `vectors/` — (nid, ne, nn) partitioned by cell: the exact-rerank
    *    tier, read only for ADC survivors.
    *
    * Delta dirs (`codes_deltas/`, `vectors_deltas/`) are read by the serve
    * path through the same [[Similarity.readWithDeltas]] protocol as
    * IVF-PQ, so incremental ingest composes identically.
    */
  def buildSqIvfIndex(corpus: DataFrame, indexDir: String, nlist: Int = 16,
      seed: Long = 42L, maxFitRows: Int = 100000): Unit = {
    val spark = corpus.sparkSession
    val c0 = corpus.select(col("id"), col("embedding"))
    val grid = fitGrid(c0, "embedding", maxFitRows)
    val coarseCents = Similarity.fitQuantizer(
      Similarity.fitSample(c0, maxFitRows), "embedding", nlist, seed)
    Similarity.deleteIndexData(spark, indexDir,
      Seq("sqmeta", "codes", "vectors", "centroids"))
    val assigned = Similarity.assignCells(c0, coarseCents)
      .withColumn("code",
        SqFunctions.sq8Encode(l2_normalize(col("embedding")), grid))
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
    spark.createDataFrame(Seq(
        (grid.offsets.toSeq, grid.scales.toSeq, grid.band, grid.dim, nlist)))
      .toDF("offsets", "scales", "band", "dim", "nlist")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/sqmeta")
  }

  /** Serve a probe batch from a persisted IVF-SQ8 index: nprobe nearest
    * cells per query (partition-pruned CODES read), byte-code ADC rank,
    * band-adaptive cut, exact rerank from the vectors tier — the
    * [[PqIndex.pqIvfQuery]] plan with the SQ8 scan tier. Wrong-dim probes
    * are refused against the persisted geometry.
    */
  def sqIvfQuery(queries: DataFrame, indexDir: String, k: Int,
      nprobe: Int = 4, refine: Int = 4, bandCap: Int = 32): DataFrame = {
    val spark = queries.sparkSession
    val meta = IndexMeta.cached(spark, s"$indexDir/sqmeta") {
      spark.read.parquet(s"$indexDir/sqmeta").head()
    }
    val grid = new Sq8Grid(
      meta.getAs[scala.collection.Seq[Double]]("offsets").toArray,
      meta.getAs[scala.collection.Seq[Double]]("scales").toArray)
    Similarity.requireProbeDim(queries, meta.getAs[Int]("dim"), indexDir)
    val band = meta.getAs[Double]("band")
    val centDf = broadcast(IndexMeta.cachedTable(spark, s"$indexDir/centroids"))
    val qe0 = toDouble(col("embedding"))
    val qe = queries.select(col("qid"), qe0.as("qe"), norm2(qe0).as("qn"),
      l2_normalize(col("embedding")).as("qn8"))
    val wCell = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cell"))
    val probePlan = qe.crossJoin(centDf)
      .withColumn("cdist", l2Distance(col("qe"), col("centroid")))
      .withColumn("crn", row_number().over(wCell))
      .where(col("crn") <= nprobe)
      .select(col("qid"), col("qe"), col("qn"), col("qn8"), col("cell"))
    val probeRows = probePlan.collect().toSeq
    val cells = probeRows.map(_.getAs[Int]("cell")).distinct
    // local relation: driver-side broadcast build, no per-serve RDD stage
    // (the Similarity.ivfIndexQuery rationale)
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probePlan.schema)
    val codes = Similarity.readWithDeltas(spark, s"$indexDir/codes",
      s"$indexDir/codes_deltas", cells, Seq("nid", "code", "cell"))
    val adc = codes.join(
        broadcast(probes.select(col("qid"), col("qn8"), col("cell"))), Seq("cell"))
      .select(col("qid"), col("nid"),
        SqFunctions.sq8Adc(col("code"), col("qn8"), grid).as("adc"))
    val cand = PqIndex.bandCut(adc, k, refine, band, bandCap)
    val vectors = Similarity.readWithDeltas(spark, s"$indexDir/vectors",
      s"$indexDir/vectors_deltas", cells, Seq("nid", "ne", "nn", "cell"))
      .join(broadcast(cand), Seq("nid"))
    val q = broadcast(probes.select(col("qid"), col("qe"), col("qn")).distinct())
    val sims = vectors.join(q, Seq("qid"))
      .select(col("qid"), col("nid"),
        (graft.functions.VectorFunctions.dot(col("qe"), col("ne")) /
          (col("qn") * col("nn"))).as("sim"))
    Similarity.topK(sims, k)
  }
}
