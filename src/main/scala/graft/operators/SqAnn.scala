package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PqFunctions.l2_normalize
import graft.functions.SqFunctions
import graft.functions.SqFunctions.Sq8Grid

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
    val rows = corpus.select(l2_normalize(col(embCol)).as("e"))
      .where(col("e").isNotNull).limit(maxFitRows).collect()
    require(rows.nonEmpty, "SQ8 fit: empty corpus")
    val dim = rows.head.getSeq[Double](0).size
    val lo = Array.fill(dim)(Double.MaxValue)
    val hi = Array.fill(dim)(Double.MinValue)
    rows.foreach { r =>
      val e = r.getSeq[Double](0)
      require(e.size == dim, s"SQ8 fit: ragged embedding (${e.size} vs $dim)")
      var i = 0
      while (i < dim) {
        if (e(i) < lo(i)) lo(i) = e(i)
        if (e(i) > hi(i)) hi(i) = e(i)
        i += 1
      }
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
}
