package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The composed training-data cleaning pipeline — the end-to-end use case
  * the extension operators exist for: quality-gate → exact dedup → near-dup
  * removal → language filter, emitting the clean corpus plus an audit of
  * why each rejected document was dropped.
  *
  * Every stage is a deterministic column program over the operators in this
  * package, so the whole pipeline remains engine-portable (oracle-checkable)
  * and shuffle-minimal: one fingerprint window exchange (exact), one banded
  * candidate join (near — signatures themselves are computed map-side by a
  * native expression and never shuffle), everything else narrow.
  */
object CorpusPipeline {

  final case class Config(
      minQuality: Double = 0.5,
      minTokens: Int = 5,
      languages: Seq[String] = Seq("en"),
      jaccardThreshold: Double = 0.5,
      // MinHash/LSH shape for the near-dup candidate stage. The banding
      // S-curve midpoint is (1/bands)^(1/rowsPerBand): the shape must be
      // chosen FOR the Jaccard threshold or candidate recall collapses.
      // Defaults (16 hashes, bands of 2 ⇒ 8 bands) give midpoint 0.354 —
      // candidate recall ≥ 90% at J = 0.5 (1−(1−0.5²)⁸), ≥ 97% at J = 0.6.
      // Bands of 4 (midpoint 0.707) would silently miss ~3/4 of true pairs
      // at the default 0.5 threshold. Raising the threshold permits wider
      // bands (fewer, tighter candidates).
      minhashK: Int = 16,
      rowsPerBand: Int = 2,
      // Width for the CPU-heavy shingle/signature stages. None inherits
      // upstream partitioning — right when the corpus is large enough that
      // scan/shuffle partitioning already provides width. Some(n) pins an
      // explicit doc_id exchange that AQE's bytes-based coalescing cannot
      // fold: per-document shingling + minhash are CPU-per-row bound, so
      // at small data volumes (or after a highly-selective quality gate)
      // coalescing-to-bytes serializes exactly the expensive stage.
      parallelism: Option[Int] = None,
      // Production guard for template-spam floods: a family of documents
      // with MODERATE mutual similarity (boilerplate pages, mirrored
      // templates — or, in the scaled synthetic instances, cross-replica
      // siblings at J≈0.25) collapses into shared LSH buckets, and the
      // within-bucket pair join goes quadratic in family size while the
      // verify stage fetches shingle arrays for every pair (measured at
      // 100× replication: 39× shuffle per data decade, 20 GB spill).
      // Some(cap) skips buckets larger than cap ([[Dedup.lshCandidates]]
      // semantics: flooded docs keep k-band chances in their smaller
      // buckets, and truly-near pairs share most bands). None = exact
      // candidate recall, the oracle-checked default.
      maxBucketSize: Option[Int] = None,
      // Production guard for verify-stage VOLUME: the Jaccard verify
      // fetches both docs' shingle arrays per candidate pair, so a doc in
      // p pairs ships its array p times — with raw 3-gram STRINGS (~40 B
      // each) that is the dominant shuffle at scale (measured at 100×
      // replication: 7.4 GB shuffle / 20 GB spill for the verify alone).
      // true hashes each shingle to a 64-bit fingerprint first: 8 B per
      // element, and the intersect runs on Spark's primitive hash-set
      // fast path. Jaccard over distinct fingerprint sets equals Jaccard
      // over the shingle sets up to 2^-64 collisions — immaterial, but
      // not BIT-exact, so the oracle-checked default stays on strings.
      fingerprintVerify: Boolean = false)

  object Config {
    /** The at-scale profile — what a production corpus build should run
      * (README quickstart uses it). The zero-arg `Config()` default is the
      * ORACLE-EXACT contract form (exact candidate recall, string-shingle
      * verify): right for cross-engine verification, but measured spilling
      * 106.5 GB at sf20 when a template-spam family floods an LSH bucket.
      * This profile turns on both production guards:
      *
      *  - `maxBucketSize = Some(64)`: flooded buckets are skipped; pair
      *    recall measured 1.000 (and doc recall 1.000, +0 spurious) at
      *    sf10 AND sf20 with shuffle 19.6→4.1 GB and spill 106.5 GB→0
      *    (`tools/CapRecall`, SCALING.md) — truly-near pairs share most
      *    bands, so they keep their chances in unflooded buckets;
      *  - `fingerprintVerify = true`: the Jaccard verify intersects 8-byte
      *    xxhash64 shingle fingerprints instead of ~40-byte raw strings
      *    (identical up to 2^-64 collisions).
      *
      * On the oracle corpus the profile's output is EQUAL to the exact
      * mode's (no bucket approaches the cap there) — pinned by
      * CorpusPipelineSpec and by q108 sharing q47's oracle at every SF.
      *
      * `parallelism`: pass the cluster's effective width (e.g.
      * `spark.sparkContext.defaultParallelism`) when the corpus arrives in
      * few/large files or behind a highly-selective gate; None inherits
      * upstream partitioning.
      */
    def production(parallelism: Option[Int] = None): Config =
      Config(parallelism = parallelism, maxBucketSize = Some(64),
        fingerprintVerify = true)
  }

  /** Annotate each doc with pipeline verdicts. Output columns:
    * doc_id, text, quality, lang_pred, n_tokens, reject_reason (null = kept).
    * Rejection precedence: low_quality > too_short > wrong_lang >
    * exact_dup > near_dup (a doc gets its first failing gate).
    * For duplicate groups the smallest doc_id survives.
    */
  def annotate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val base = docs.select(
      col("doc_id"), col("text"),
      round(TextFunctions.qualityScore(col("text")), 4).as("quality"),
      TextFunctions.langId(col("text")).as("lang_pred"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.fingerprint(col("text")).as("__fp"))

    // exact dups: keep the smallest id per fingerprint, via a window min
    // over ONE fingerprint exchange (not groupBy + join-back, which scans
    // the corpus and recomputes the text expressions twice). Every
    // downstream consumer — survivors, both shingle branches, the final
    // join — shares this exchange's canonical subtree, so ReuseExchange
    // makes the scan + quality/langId/fingerprint map side run ONCE.
    // NULL-fingerprint (null-text) docs form their own window group and
    // flow on to the reject gate (the old inner join silently dropped
    // them); the oracle SQL mirrors the same window form.
    val withExact = base.withColumn("__exact_dup",
      col("doc_id") =!= min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))))

    // near dups among surviving candidates: MinHash → LSH bands → candidate
    // pairs → exact Jaccard verify. Banding is the ZERO-shuffle narrow form
    // (all k minima per doc from the native MinHashSigs expression over the
    // shingle array, band sigs as column concats — nothing signature-side
    // ever exchanges); the verify is an
    // `array_intersect` over per-doc shingle ARRAYS fetched by two id
    // joins. The plan contains NO shingle-level join at all, so a common
    // shingle shared by k docs costs nothing unless LSH already paired
    // them (the k² blowup a shingle self-join would produce at corpus
    // scale). The larger id of each confirmed pair is dropped.
    val sur0 = withExact.where(!col("__exact_dup"))
      .select(col("doc_id"), col("text"))
    val survivors = cfg.parallelism
      .map(p => sur0.repartition(p, col("doc_id"))).getOrElse(sur0)
    val arrays = Dedup.shingleArrays(survivors, "doc_id", "text", n = 3)
    val candidates = Dedup.lshCandidates(
      Dedup.minhashBandsNarrow(arrays, cfg.minhashK, cfg.rowsPerBand),
      cfg.maxBucketSize)
    val verifyArrays = if (cfg.fingerprintVerify)
      arrays.select(col("id"), transform(col("sh"), x => xxhash64(x)).as("sh"))
    else arrays
    val nearPairs = Dedup.jaccardOnArrays(candidates, verifyArrays)
      .where(col("jaccard") >= cfg.jaccardThreshold)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("__near_dup", lit(true))

    withExact.join(nearPairs, Seq("doc_id"), "left")
      .withColumn("reject_reason",
        // NULL text first: quality/n_tokens are NULL for it, so the gates
        // below would all be skipped (NULL predicates) and a null doc
        // could sail into the clean corpus
        when(col("text").isNull, "low_quality")
          .when(col("quality") < cfg.minQuality, "low_quality")
          .when(col("n_tokens") < cfg.minTokens, "too_short")
          .when(!col("lang_pred").isin(cfg.languages: _*), "wrong_lang")
          .when(col("__exact_dup"), "exact_dup")
          .when(coalesce(col("__near_dup"), lit(false)), "near_dup"))
      .select(col("doc_id"), col("text"), col("quality"), col("lang_pred"),
        col("n_tokens"), col("reject_reason"))
  }

  /** The clean corpus: annotated docs with no rejection. */
  def clean(docs: DataFrame, cfg: Config = Config()): DataFrame =
    annotate(docs, cfg).where(col("reject_reason").isNull)

  /** Audit summary: kept/dropped counts per reason. */
  def auditSummary(annotated: DataFrame): DataFrame =
    annotated.groupBy(coalesce(col("reject_reason"), lit("kept")).as("verdict"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy(col("verdict"))
}
