package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document deduplication for training-data pipelines: exact (fingerprint
  * hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Portability-by-construction: every hash in this module is derived from
  * md5 over explicit strings, so signatures are bit-identical across engines
  * (the DuckDB oracle recomputes them and hash-matches).
  *
  * Scale notes (100 TB):
  *  - exact dedup is one shuffle on a 32-byte fingerprint, not the document;
  *  - MinHash banding turns all-pairs O(n²) into a join on (band, signature)
  *    buckets — only near-identical docs collide, so the join fan-out is the
  *    candidate-pair count, not n²;
  *  - the Jaccard verifier runs only on candidate pairs.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest id.
    * One shuffle over (16-byte md5) keys; document bodies never shuffle.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(TextFunctions.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word n-gram shingles of the token array; docs shorter than `n` tokens
    * produce an empty array. Delegates to the shared n-gram builder.
    */
  def shingles(toks: Column, n: Int): Column = TextFunctions.ngrams(toks, n)

  /** Per-document distinct shingle table: (id, shingle). */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs.where(size(toks) >= n)
      .select(col(idCol).as("id"), explode(array_distinct(shingles(toks, n))).as("shingle"))
  }

  /** Wide MinHash signatures: one row per doc, k min-hash columns h0..h{k-1}
    * with h_i = min over the doc's shingles of md5(i ‖ ':' ‖ s) (min over
    * 32-hex-char strings — total order, engine-portable). A single
    * groupBy(id) computes all k minima as parallel agg columns — the
    * explode-×k-then-group form shuffles k× the rows and pays a second
    * aggregation for banding; this shape is one shuffle of 1× rows.
    */
  def minhashWide(shingled: DataFrame, k: Int = 16): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(i.toString), lit(":"), col("shingle")).cast("binary"))).as(s"h$i"))
    shingled.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signatures in long form: (id, i, minhash) — [[minhashWide]]
    * unpivoted. Kept for callers that consume raw signature rows; the
    * banding pipeline goes through [[minhashBands]] (no intermediate
    * long-form shuffle at all).
    */
  def minhashSignatures(shingled: DataFrame, k: Int = 16): DataFrame =
    minhashWide(shingled, k)
      .select(col("id"), explode(array((0 until k).map(i =>
        struct(lit(i).as("i"), col(s"h$i").as("minhash"))): _*)).as("s"))
      .select(col("id"), col("s.i").as("i"), col("s.minhash").as("minhash"))

  /** Fused MinHash → LSH bands: (id, band, band_sig) in ONE shuffle. The k
    * minima come from [[minhashWide]]'s single groupBy and each band
    * signature is a column-level concat_ws over its slice of signature
    * columns — no collect_list/array_sort/transform (Spark evaluates those
    * higher-order forms interpreted, outside codegen). Output rows are
    * bit-identical to `lshBands(minhashSignatures(…))`.
    */
  def minhashBands(shingled: DataFrame, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val bandCols = (0 until k / rowsPerBand).map { b =>
      val sig = md5(concat_ws(",",
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i")): _*).cast("binary"))
      struct(lit(b).as("band"), sig.as("band_sig"))
    }
    minhashWide(shingled, k)
      .select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.band_sig").as("band_sig"))
  }

  /** MinHash → LSH bands with ZERO exchanges: signatures come from the
    * native [[graft.functions.MinHashSigs]] expression (all k minima in one
    * map-side pass over each doc's shingle ARRAY), and band signatures are
    * column-level md5s over signature slices. Row-identical to
    * `minhashBands(explode(arrays))` — same md5 inputs, same minima, same
    * band hashing — but the per-document signature work never shuffles:
    * the only exchange in an LSH dedup pass is the candidate join itself.
    * Input: a [[shingleArrays]] frame (id, sh).
    */
  def minhashBandsNarrow(arrays: DataFrame, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    import graft.functions.MinHashSigs.minhash_sigs
    val bandCols = (0 until k / rowsPerBand).map { b =>
      val sig = md5(concat_ws(",",
        (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => element_at(col("sig"), i + 1)): _*).cast("binary"))
      struct(lit(b).as("band"), sig.as("band_sig"))
    }
    arrays.select(col("id"), minhash_sigs(col("sh"), k).as("sig"))
      .where(size(col("sig")) > 0) // parity: sig-less docs had no agg rows
      .select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.band_sig").as("band_sig"))
  }

  /** LSH bands: group the k signature rows into bands of `rowsPerBand`, and
    * hash each band's ordered minhashes into one band signature.
    * Output: (id, band, band_sig).
    */
  def lshBands(sigs: DataFrame, rowsPerBand: Int = 4): DataFrame =
    sigs.withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("minhash")))),
          x => x.getField("minhash"))).cast("binary")).as("band_sig"))

  /** Candidate near-duplicate pairs: docs sharing at least one LSH band.
    *
    * `maxBucketSize`: skip buckets holding more than N docs. A flood of
    * near-identical documents (template spam, mirrored pages) lands in ONE
    * (band, band_sig) bucket and the self-join emits C(n,2) pairs — at
    * corpus scale, a million-doc bucket is a half-trillion-pair stage. A
    * capped bucket is the standard guard (its members are so mutually
    * similar that downstream clustering recovers them through transitive
    * pairs in their OTHER, smaller buckets; a doc in k bands gets k
    * chances). Default unlimited — exact recall, the oracle-checked mode.
    */
  def lshCandidates(bands: DataFrame, maxBucketSize: Option[Int] = None): DataFrame = {
    val bounded = maxBucketSize match {
      case None => bands
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_sig"))
        bands.withColumn("__bn", count(lit(1)).over(w))
          .where(col("__bn") <= cap).drop("__bn")
    }
    val a = bounded.select(col("id").as("id_a"), col("band"), col("band_sig"))
    val b = bounded.select(col("id").as("id_b"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs (the verify
    * step after LSH, or a direct all-pairs check on small inputs).
    * `shingled` is a [[shingleTable]]; returns (id_a, id_b, jaccard).
    */
  def jaccardOnPairs(pairs: DataFrame, shingled: DataFrame): DataFrame = {
    val counts = shingled.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = shingled.select(col("id").as("id_a"), col("shingle"))
    val b = shingled.select(col("id").as("id_b"), col("shingle"))
    // candidate-bounded intersection: fan each pair out over id_a's
    // shingles, then probe id_b's shingles on (id_b, shingle). Cost is
    // O(Σ_pairs |shingles(id_a)|) — the shingle SELF-join never runs, so a
    // common shingle shared by k docs costs nothing unless LSH already
    // paired them (the k² blowup the banded join exists to avoid).
    val common = pairs.join(a, Seq("id_a")).join(b, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    common
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
  }

  /** Per-document distinct shingle ARRAYS — the no-explode twin of
    * [[shingleTable]] for pipelines that consume whole documents' shingle
    * sets (narrow minhash, array-intersect Jaccard). One row per doc.
    */
  def shingleArrays(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs.where(size(toks) >= n)
      .select(col(idCol).as("id"), array_distinct(shingles(toks, n)).as("sh"))
  }

  /** Exact n-gram Jaccard for candidate pairs over shingle ARRAYS: two id
    * joins to fetch each side's array, then a native hash-set intersection
    * count ([[graft.functions.IntersectSize]]) — no shingle-level join
    * exists anywhere in the plan, so cost is O(candidate pairs × array
    * size), never all-pairs. (`size(array_intersect(...))` computes the
    * same number but Spark's string-array intersect is a nested O(|a|·|b|)
    * scan — measured ~20× slower on the sf1 verify stage.)
    */
  def jaccardOnArrays(pairs: DataFrame, arrays: DataFrame): DataFrame = {
    // string arrays → the native IntersectSize (Spark's string
    // array_intersect is a nested scan); primitive arrays (the
    // fingerprint-verify tier) → builtin array_intersect, which has the
    // hash-set fast path for primitives
    val isString = arrays.schema("sh").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    def common(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      if (isString) graft.functions.IntersectSize.intersect_size(a, b)
      else size(array_intersect(a, b))
    pairs
      .join(arrays.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(arrays.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        common(col("sh_a"), col("sh_b")).as("common"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space twin of
    * MinHash dedup, routed through sign-hyperplane LSH buckets so the pair
    * generation is bucket-local, never all-pairs (the O(n²) broadcast
    * nested-loop a naive `a.join(b, id_a < id_b)` produces).
    *
    * Multi-table LSH (the classic E2LSH AND-OR construction): `nTables`
    * independent tables of `bitsPerTable` hyperplane sign bits each; two
    * docs are candidates when they share a bucket in ANY table, and every
    * candidate is cosine-verified, so output ⊆ the exact answer with miss
    * probability (1 − (1 − θ/π)^b)^L per true pair — ≈0.01% at cos ≥ 0.9
    * with the defaults (12 tables × 4 bits). Plan shape at 100 TB: the
    * corpus fans out ×nTables and shuffles once on (table, bucket); pair
    * count is bucket-bounded.
    */
  /** Bits per LSH table sized to the corpus: buckets must GROW with n or
    * per-bucket pair generation degenerates toward O(n²/2^bits). Targets
    * ~`targetBucketRows` rows per bucket (2^bits ≈ n / target), clamped to
    * [4, 24]; recall per pair falls slowly with bits (each extra bit costs
    * (1 − θ/π) ≈ 0.91 at cos 0.9 per table, compensated by the OR over
    * tables), while pair cost falls 2×, so erring high is safe. Callers
    * with a known corpus size pass it; the default 4 suits ≤ ~10k rows.
    */
  def bitsPerTableFor(corpusRows: Long, targetBucketRows: Int = 512): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, corpusRows.toDouble / targetBucketRows)) / math.log(2.0)).toInt
    math.min(24, math.max(4, needed))
  }

  /** Multi-table sign-LSH bucketing of an embedding column: one row per
    * (vector, table) with `tb = (table, sign-bucket)`, the raw vector and
    * its norm riding along. Deterministic (seeded hyperplanes), map-side
    * only — the shared candidate-generation stage of [[embeddingNearDups]]
    * and the streaming embedding index.
    */
  def embeddingBuckets(emb: DataFrame, idCol: String, embCol: String, dim: Int,
      nTables: Int = 12, bitsPerTable: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions._
    import graft.operators.Similarity.hyperplanes
    require(bitsPerTable > 0, "bitsPerTable must be explicit here; size it " +
      "with bitsPerTableFor(corpusRows) — the 0 sentinel resolves only in " +
      "callers that know the corpus (embeddingNearDups, EmbeddingIndex.seed)")
    val planes = hyperplanes(nTables * bitsPerTable, dim)
    // bucket id per table t = sign bits of planes [t*b, t*b+b); each test is
    // a codegen'd dot of the raw embedding against a double-literal plane
    val bucketCols = (0 until nTables).map { t =>
      val bits = (0 until bitsPerTable).map { p =>
        when(dot(col(embCol), typedLit(planes(t * bitsPerTable + p).toSeq)) >= 0,
          lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("t"), bits.as("b"))
    }
    // norms ride along once per row (computed over the same double view
    // the pair verify dots, so cosine arithmetic matches the exact path);
    // the per-pair verify is one dot + divide
    emb.select(col(idCol).as("id"), toDouble(col(embCol)).as("e"),
      norm2(toDouble(col(embCol))).as("nrm"), explode(array(bucketCols: _*)).as("tb"))
  }

  /** `bitsPerTable = 0` auto-sizes buckets to the corpus via
    * [[bitsPerTableFor]] (one count pass) — the at-scale mode: a fixed
    * bit width leaves bucket sizes growing linearly with the corpus, and
    * the within-bucket pair join quadratically.
    */
  def embeddingNearDups(emb: DataFrame, idCol: String, embCol: String, dim: Int,
      threshold: Double = 0.9, nTables: Int = 12, bitsPerTable: Int = 4,
      roundScale: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions._
    val bits = if (bitsPerTable > 0) bitsPerTable else bitsPerTableFor(emb.count())
    val bucketed = embeddingBuckets(emb, idCol, embCol, dim, nTables, bits)
    val a = bucketed.select(col("tb"), col("id").as("id_a"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = bucketed.select(col("tb"), col("id").as("id_b"),
      col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("tb"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ea"), col("eb"), col("na"), col("nb"))
      .distinct() // a pair may collide in several tables
      .select(col("id_a"), col("id_b"),
        round((dot(col("ea"), col("eb")) / (col("na") * col("nb"))), roundScale).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Incremental exact dedup: classify a NEW batch of documents against an
    * existing corpus fingerprint index — the shape of a continuously-fed
    * training corpus, where re-deduplicating 100 TB per incoming batch is
    * not an option. The index side is fingerprints ONLY (16 bytes/doc, no
    * text), so the join shuffles fingerprints, never documents, and a
    * small incoming batch broadcasts against it.
    * Output: (id, fp, verdict) with verdict ∈ 'known_dup' (fingerprint
    * already in the corpus) | 'batch_dup' (duplicate within the incoming
    * batch; smallest id is the keeper) | 'new'.
    */
  def incrementalExact(newDocs: DataFrame, idCol: String, textCol: String,
      corpusFps: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    newDocs.select(col(idCol).as("id"), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .join(corpusFps.select(col("fp")).distinct().withColumn("__known", lit(true)),
        Seq("fp"), "left")
      .withColumn("verdict",
        when(col("__known"), "known_dup")
          .when(col("id") =!= min(col("id")).over(w), "batch_dup")
          .otherwise("new"))
      .select(col("id"), col("fp"), col("verdict"))
  }

  /** Incremental near-dup pairs: LSH-band candidates of an incoming batch
    * against a PREBUILT corpus band index (plus the batch against itself),
    * verified by exact Jaccard over shingle arrays. In production the
    * corpus bands/arrays are maintained incrementally (append-only index
    * tables); recomputing them per batch — as the registry query does for
    * oracle parity — is the bounded-corpus test harness, not the shape.
    * Output: (id_new, id_other, jaccard) with jaccard ≥ threshold, where
    * id_other ranges over corpus ids and smaller batch ids.
    */
  def incrementalNearDups(newBands: DataFrame, newArrays: DataFrame,
      corpusBands: DataFrame, corpusArrays: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    // id inequality: an at-least-once upstream can re-deliver a doc id the
    // index already holds — jaccard(X, X) = 1 must not emit a self-pair
    val vsCorpus = newBands.select(col("band"), col("band_sig"), col("id").as("id_new"))
      .join(corpusBands.select(col("band"), col("band_sig"), col("id").as("id_other")),
        Seq("band", "band_sig"))
      .where(col("id_other") =!= col("id_new"))
    val vsBatch = newBands.select(col("band"), col("band_sig"), col("id").as("id_new"))
      .join(newBands.select(col("band"), col("band_sig"), col("id").as("id_other")),
        Seq("band", "band_sig"))
      .where(col("id_other") < col("id_new"))
    val pairs = vsCorpus.unionByName(vsBatch)
      .select(col("id_new"), col("id_other")).distinct()
    val arrays = newArrays.unionByName(corpusArrays)
    jaccardOnArrays(
      pairs.select(col("id_new").as("id_a"), col("id_other").as("id_b")), arrays)
      .where(col("jaccard") >= threshold)
      .select(col("id_a").as("id_new"), col("id_b").as("id_other"), col("jaccard"))
      // a duplicated corpus arrays row (the index compactor's documented
      // crash window) would otherwise emit the same verified pair twice;
      // the verified set is small, so the dedup is cheap insurance
      .distinct()
  }

  /** Paragraph-level exact dedup: drop every paragraph that already
    * appeared earlier in the corpus (first occurrence in (doc_id, position)
    * order wins) and reassemble each document from its surviving
    * paragraphs — the standard boilerplate-removal pass (nav bars, cookie
    * banners, signature blocks repeat across millions of pages; whole-doc
    * dedup never sees them).
    *
    * Scale shape: paragraphs are DECIDED by fingerprint — the keep/drop
    * window shuffles (16-byte md5, doc_id, position) only — and paragraph
    * TEXT moves once, in the reassembly exchange keyed by doc_id. The
    * fp-keyed window never carries bodies, so a paragraph repeated a
    * million times costs a million 28-byte rows in one partition, not a
    * million bodies.
    *
    * Output: (doc_id, n_paras, n_kept, clean_text) — clean_text is the
    * kept paragraphs joined by the separator, NULL when every paragraph of
    * the doc was dropped (a fully-boilerplate doc). Paragraphs are literal
    * `sep`-separated segments; fingerprints use [[TextFunctions
    * .normalizedText]], so whitespace-only variants of a paragraph dedup
    * together while reassembly preserves the kept originals verbatim.
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paras = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("i", "para")))
    val keyed = paras.select(col("doc_id"), col("i"),
      TextFunctions.fingerprint(col("para")).as("fp"))
    val keep = keyed.withColumn("rn",
      row_number().over(Window.partitionBy(col("fp"))
        .orderBy(col("doc_id"), col("i"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("i"))
    val kept = paras.join(keep, Seq("doc_id", "i"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("i"), col("para")))),
          x => x.getField("para")), sep).as("clean_text"))
    docs.select(col(idCol).as("doc_id"),
      (size(split(col(textCol), java.util.regex.Pattern.quote(sep))))
        .cast("long").as("n_paras"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("clean_text"))
  }

  /** Directional shingle containment |A ∩ B| / |A| for candidate pairs —
    * the partial-copy detector Jaccard under-scores: a short document fully
    * contained in a long one has Jaccard ≈ |A|/|B| (small) but containment
    * ≈ 1. Same join shape as [[jaccardOnArrays]]: two id joins fetch the
    * shingle arrays, one native [[graft.functions.IntersectSize]] count per
    * candidate pair, no shingle-level join anywhere.
    * Output: (id_a, id_b, containment_a, containment_b, jaccard).
    */
  def containmentOnArrays(pairs: DataFrame, arrays: DataFrame): DataFrame =
    pairs
      .join(arrays.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(arrays.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.IntersectSize.intersect_size(col("sh_a"), col("sh_b")).as("common"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / col("n_a")).as("containment_a"),
        (col("common").cast("double") / col("n_b")).as("containment_b"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
          .as("jaccard"))

  /** Benchmark decontamination: flag training documents sharing at least
    * `minHits` word n-grams with any benchmark/eval document — the
    * standard guard against test-set leakage into a training corpus.
    * Returns (train_id, bench_id, n_hits) per contaminated pair.
    *
    * Scale shape: the benchmark side is tiny (eval suites, not corpora) —
    * its distinct gram table BROADCASTS, so the train side is one narrow
    * scan + explode probing a hash map: no shuffle of training data at
    * all. n = 8 is the customary window (long enough that natural reuse of
    * phrases doesn't false-positive, short enough to catch paraphrase-free
    * copying); lower it for stricter screens.
    */
  def contamination(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 8, minHits: Int = 1): DataFrame = {
    val trainGrams = shingleTable(train, trainId, trainText, n)
      .select(col("id").as("train_id"), col("shingle"))
    val benchGrams = broadcast(shingleTable(bench, benchId, benchText, n)
      .select(col("id").as("bench_id"), col("shingle")))
    trainGrams.join(benchGrams, Seq("shingle"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
  }

  /** NEAR-duplicate decontamination: flag training documents that are
    * near-copies of benchmark documents even when no verbatim 8-gram survives
    * (light paraphrase, token-level noise, re-wrapped text) — the fuzzy
    * tier above [[contamination]]'s exact-gram screen. Cross-corpus
    * MinHash/LSH: band signatures on BOTH corpora, candidates where any
    * band collides, exact Jaccard verify on the candidate sliver.
    *
    * Scale shape: the benchmark side is eval suites — its band index AND
    * its shingle arrays broadcast, so the 100 TB training side computes
    * map-side signatures ([[minhashBandsNarrow]]'s zero-shuffle form) and
    * probes two broadcast maps: the training corpus never shuffles, same
    * as the exact tier. Output: (train_id, bench_id, jaccard) for verified
    * pairs ≥ `threshold` — distinct train_ids are the contamination set;
    * keeping the bench attribution makes the screen auditable.
    *
    * `rowsPerBand` trades candidate volume for recall at LOW Jaccard: a
    * mutated copy at J≈0.65 collides per band with prob J^rows — 0.42 at
    * 2 rows vs 0.18 at 4 — and decontamination wants recall (a missed
    * contaminated doc poisons an eval; a false candidate costs one exact
    * verify), so the default is 2, not the dedup family's 4.
    */
  def nearContamination(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 3, k: Int = 16, rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val trainArr = shingleArrays(train, trainId, trainText, n)
    val benchArr = shingleArrays(bench, benchId, benchText, n)
    val tb = minhashBandsNarrow(trainArr, k, rowsPerBand)
      .select(col("id").as("train_id"), col("band"), col("band_sig"))
    val bb = broadcast(minhashBandsNarrow(benchArr, k, rowsPerBand)
      .select(col("id").as("bench_id"), col("band"), col("band_sig")))
    val cands = tb.join(bb, Seq("band", "band_sig"))
      .select(col("train_id"), col("bench_id")).distinct()
    cands
      .join(trainArr.select(col("id").as("train_id"), col("sh").as("sh_a")), Seq("train_id"))
      .join(broadcast(benchArr.select(col("id").as("bench_id"), col("sh").as("sh_b"))),
        Seq("bench_id"))
      .select(col("train_id"), col("bench_id"),
        graft.functions.IntersectSize.intersect_size(col("sh_a"), col("sh_b")).as("common"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .select(col("train_id"), col("bench_id"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** One representative per duplicate cluster by QUALITY policy: the
    * highest-scoring member survives (smallest id on ties) instead of the
    * smallest id — dedup should keep the best copy, not the oldest.
    * `members` carries (id, cluster_id) from [[clusters]]; `scores` maps
    * id → score. One cluster-keyed window exchange; scores join by id.
    */
  def clusterRepresentatives(members: DataFrame, scores: DataFrame,
      idCol: String = "id", scoreCol: String = "score"): DataFrame = {
    // LEFT join + nulls-last ordering: a member missing from `scores`
    // (quality computed over a filtered slice, say) must still COUNT as a
    // member and must lose the election only to a scored sibling — an
    // inner join would silently shrink n_members and could vanish a
    // whole cluster
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol))
    members.join(scores, Seq(idCol), "left")
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_members",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"))))
      .where(col("__rn") === 1)
      .select(col("cluster_id"), col(idCol).as("keep_id"),
        col(scoreCol).as("keep_score"), col("n_members"))
  }

  /** [[contamination]] with a bloom prefilter tier — the 100 TB shape when
    * even the bench GRAM TABLE is too big to broadcast-join against every
    * training shingle. Tier 1 aggregates the bench shingles into one
    * bloom sketch (built distributed — partial sketches OR-merge; only the
    * ~MB sketch reaches the driver) and probes it MAP-SIDE over the
    * training grams: the overwhelmingly-clean corpus is filtered with zero
    * shuffle and zero join. Tier 2 exact-verifies only the flagged sliver
    * with the plain gram join, killing bloom false positives. No false
    * negatives (bloom guarantee) + exact verify ⇒ result ≡
    * [[contamination]], deterministically — the sketch changes WHICH rows
    * reach tier 2, never the answer.
    */
  def contaminationBloom(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 8, minHits: Int = 1,
      expectedBenchGrams: Long = 1L << 22, fpp: Double = 0.001): DataFrame = {
    import graft.functions.BloomFunctions
    val trainGrams = shingleTable(train, trainId, trainText, n)
      .select(col("id").as("train_id"), col("shingle"))
    val benchGrams = shingleTable(bench, benchId, benchText, n)
      .select(col("id").as("bench_id"), col("shingle"))
    // the sketch rides as a SCALAR SUBQUERY (might_contain requires a
    // constant/scalar bloom), so tier 1 is a plain Filter over the train
    // grams — no join node at all on the corpus side
    val sketch = benchGrams.agg(
      BloomFunctions.bloomAgg(col("shingle"), expectedBenchGrams, fpp).as("__bf")).scalar()
    val flagged = trainGrams
      .where(BloomFunctions.mightContain(sketch, col("shingle")))
    flagged.join(benchGrams, Seq("shingle"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
  }

  /** Connected components over a near-duplicate pair graph: every document
    * gets a `cluster_id` = the smallest doc id reachable through verified
    * pairs — the step that turns pairwise "A≈B" verdicts into duplicate
    * GROUPS so one canonical doc per group survives (pairwise drop-the-
    * larger loses docs when clusters overlap: {A,B} and {B,C} would drop
    * both B and C even if A≉C).
    *
    * Algorithm: hash-min label propagation — each round every vertex takes
    * the min of its own label and its neighbors' labels. Converges in
    * (cluster diameter) rounds; near-dup clusters are shallow (members are
    * mutual near-copies), so 3-5 rounds is typical. Each round is ONE
    * shuffle of (id, label) pairs — never documents — and each intermediate
    * is `localCheckpoint`ed to truncate lineage (iteration N's plan would
    * otherwise embed all N-1 predecessors; on a real cluster, swap in
    * `checkpoint` against a reliable dir). Convergence is detected by the
    * label sum (labels only decrease, so an unchanged sum across a round ⇒
    * fixpoint) — one scalar agg, checked every SECOND round so the steady-
    * state cost is one materializing action per round plus half a
    * convergence job (the r6 profile showed the per-round fixed cost, not
    * data volume, dominating at sf1).
    *
    * Shuffle profile: edges are hash-partitioned by `dst` and labels by
    * `id` ONCE at setup (`localCheckpoint` preserves the physical
    * partitioning in the checkpointed plan), so the per-round neighbor
    * join needs no exchange; the only per-round shuffle is the
    * `groupBy(src)` min — (id,label)-sized, never document-sized.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 25,
      localEdgeLimit: Long = 524288L): DataFrame = {
    val nPart = pairs.sparkSession.sessionState.conf.numShufflePartitions
    // Both orientations of each pair; orientations can't collide, and the
    // min-propagation below is idempotent under duplicate edges, so no
    // distinct — the co-partitioning repartition is the only setup shuffle.
    // (Measured dead end, r7: running the loop with AQE disabled — static
    // co-partitioned SMJs — was ~2× SLOWER than letting AQE broadcast the
    // tiny label side per round; keep AQE on.)
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(nPart, col("dst"))
      .localCheckpoint() // reused every round — never recompute the pair source
    // SIZE-ADAPTIVE strategy switch (r14, the broadcast-join-threshold
    // discipline): the verified near-dup pair graph is ordinarily tiny
    // relative to the corpus — at or under `localEdgeLimit` ORIENTED rows
    // (~16 B/edge: bounded driver metadata, the centroid/manifest-cache
    // class) the fixpoint runs as one driver-local union-find instead of
    // O(diameter) rounds of join+agg actions whose per-round scheduling
    // cost dominates exactly when the graph is small (measured: ~30 jobs,
    // ~1.5 s of q70's wall, for a 136-edge graph). The count is one cheap
    // job over the already-checkpointed edges; bigger graphs take the
    // distributed loop unchanged. Integral id types only — the local min
    // must reproduce Spark's `least` ordering bit-for-bit, which numeric
    // orderings do and string collations are not worth auditing for.
    val integralIds = pairs.schema("id_a").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (integralIds && edges.count() <= localEdgeLimit) {
      val idType = pairs.schema("id_a").dataType
      val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .collect()
      // union-find with path compression + union by size, then label every
      // member with its component's min id — exactly the propagation
      // loop's fixpoint
      val index = new java.util.HashMap[Long, Integer]()
      val ids = new scala.collection.mutable.ArrayBuffer[Long]()
      def idx(v: Long): Int = {
        val got = index.get(v)
        if (got != null) got.intValue()
        else { val i = ids.length; index.put(v, i); ids += v; i }
      }
      val parent = new scala.collection.mutable.ArrayBuffer[Int]()
      val size = new scala.collection.mutable.ArrayBuffer[Int]()
      def find(x0: Int): Int = {
        var x = x0
        while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
        x
      }
      es.foreach { r =>
        val a = idx(r.getLong(0)); val b = idx(r.getLong(1))
        while (parent.length < ids.length) { parent += parent.length; size += 1 }
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (size(ra) >= size(rb)) { parent(rb) = ra; size(ra) += size(rb) }
          else { parent(ra) = rb; size(rb) += size(ra) }
        }
      }
      val minOf = new java.util.HashMap[Integer, java.lang.Long]()
      var i = 0
      while (i < ids.length) {
        val r = find(i)
        val cur = minOf.get(r)
        if (cur == null || ids(i) < cur.longValue()) minOf.put(r, ids(i))
        i += 1
      }
      val out = (0 until ids.length).map(j => (ids(j), minOf.get(find(j)).longValue()))
      val spark = pairs.sparkSession
      return spark.createDataFrame(out).toDF("id", "cluster_id")
        .select(col("id").cast(idType).as("id"),
          col("cluster_id").cast(idType).as("cluster_id"))
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .repartition(nPart, col("id"))
      .localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    def propagate(lbl: DataFrame): DataFrame = {
      val nbrMin = edges
        .join(lbl.select(col("id").as("dst"), col("label").as("nbr_label")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("nbr_label")).as("nbr_label"))
      lbl
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
    }
    // No initial sum action: with any pairs at all, round 1 always changes
    // labels, so the first useful comparison is round 1 vs round 2.
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // TWO hops per materialized round: the r6 profile showed driver-side
      // per-action latency (not data volume) dominating, so halving the
      // action count halves the fixed cost; near-dup clusters have diameter
      // 1-2, so one fused round usually reaches the fixpoint outright.
      val next = propagate(propagate(labels)).localCheckpoint()
      labels = next
      iter += 2
      // Labels only decrease, so an unchanged sum across a fused round ⇒
      // fixpoint (a monotone pass that changes nothing at hop 2k changes
      // nothing at 2k+1 either).
      val s = labelSum(next)
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** All-pairs n-gram Jaccard ≥ threshold via a shingle-join (skips LSH;
    * right for the verify path and small-to-medium corpora — the shingle
    * join only materializes pairs that share a shingle).
    */
  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // not cached: the table is cheap to recompute relative to the join, and
    // a library-held cache would leak executor storage across invocations —
    // callers running this repeatedly should persist the shingle table
    // themselves with a lifetime they control
    val sh = shingleTable(docs, idCol, textCol, n)
    val a = sh.select(col("id").as("id_a"), col("shingle"))
    val b = sh.select(col("id").as("id_b"), col("shingle"))
    val common = a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    val counts = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    common
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Positioned k-gram table: (id, pos, fp) with 1-based token start
    * positions (matching SQL list indexing, so oracles mirror with no ±1
    * fixups) and md5 gram fingerprints. One row per token of the corpus —
    * shuffle currency for the repeated-span passes below is (16-byte md5,
    * id, pos), never gram text.
    */
  private def gramTable(docs: DataFrame, idCol: String, textCol: String,
      k: Int, parallelism: Option[Int]): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // the CorpusPipeline.Config.parallelism discipline: tokenize + k-gram
    // + per-gram hashing is CPU-per-row bound, and a small/compact corpus
    // scans as 1-3 partitions — Some(n) pins an explicit doc exchange so
    // the expensive stage runs at cluster width (measured on q103: the
    // gram stage ran on 2-3 of 32 cores). None inherits upstream
    // partitioning — right when the scan already provides width.
    val wide = parallelism.map(p => docs.repartition(p, col(idCol)))
      .getOrElse(docs)
    wide.where(size(toks) >= k)
      .select(col(idCol).as("id"),
        posexplode(shingles(toks, k)).as(Seq("pos0", "gram")))
      .select(col("id"), (col("pos0") + 1).cast("long").as("pos"),
        md5(col("gram").cast("binary")).as("fp"))
  }

  /** Occurrences of k-grams whose content appears ≥ `minCount` times
    * corpus-wide (across documents or repeated within one): (id, pos).
    */
  private def flaggedGramPositions(docs: DataFrame, idCol: String,
      textCol: String, k: Int, minCount: Int,
      parallelism: Option[Int]): DataFrame = {
    val grams = gramTable(docs, idCol, textCol, k, parallelism)
    val dup = grams.groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount).select(col("fp"))
    grams.join(dup, Seq("fp"), "left_semi").select(col("id"), col("pos"))
  }

  /** Merge 1-based gram start positions into maximal spans: starts p₁ < p₂
    * belong to one span iff p₂ ≤ p₁ + k (their k-token windows overlap or
    * touch). Classic gaps-and-islands over flagged positions only.
    */
  private def mergeSpans(flagged: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    flagged
      .withColumn("new_span",
        when(col("pos") > lag(col("pos"), 1).over(w) + k, 1).otherwise(0))
      .withColumn("island",
        sum(col("new_span")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + k - 1).as("span_end"))
      .select(col("id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Token-level repeated-span detection — the distributable re-expression
    * of exact-substring dedup (the suffix-array "ExactSubstr" pass of
    * training-data pipelines; Lee et al. 2022, arXiv:2107.06499): any window
    * of `k` consecutive tokens whose content occurs at least `minCount`
    * times corpus-wide (in other documents OR repeated within one) is a
    * duplicated gram, and overlapping/adjacent duplicated grams merge into
    * maximal spans. Catches the long verbatim quotes, licence blocks, and
    * boilerplate headers that document-level MinHash down-weights (a 200-
    * token block inside two otherwise-different 10k-token docs moves
    * Jaccard by ~1%) and paragraph dedup misses when paragraph boundaries
    * differ.
    *
    * Output: one row per maximal span — (id, span_start, span_end,
    * span_tokens), 1-based inclusive token indices.
    *
    * Scale shape (100 TB): the gram table is one row per corpus token with
    * a 16-byte key — the same shuffle profile as the TF-IDF (doc, term)
    * stage; the occurrence count map-side combines, and the flag-back is a
    * left-semi join on the same key (exchange reuse applies). The span
    * merge window runs per document over flagged positions ONLY —
    * ordinarily a small fraction — never the full token stream. A template
    * gram repeated millions of times costs its count, not a pair join:
    * nothing here is quadratic, unlike the shingle self-join family.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 10, minCount: Int = 2,
      parallelism: Option[Int] = None): DataFrame =
    mergeSpans(flaggedGramPositions(docs, idCol, textCol, k, minCount,
      parallelism), k)

  /** Repeated-span removal with keep-first semantics: every duplicated
    * k-gram keeps its corpus-first occurrence (ordered by (id, pos)); all
    * other occurrences' windows are cut and documents reassembled from the
    * surviving tokens. Gram-granular keep-first is the distributable form
    * of "drop all but one copy of each repeated substring": within one
    * maximal repeated span the keeper document owns every gram of the span
    * (same content ⇒ same (id, pos)-minimal doc), so spans survive or die
    * whole except where spans with different first-owners overlap — there
    * each owner keeps its own part, i.e. strictly LESS text is removed
    * than span-level arbitration would, never more.
    *
    * Output: (id, n_tokens, n_removed, clean_text) where `clean_text` is
    * the surviving canonical tokens space-joined — token-level dedup is
    * defined over the token stream, so original casing/punctuation/spacing
    * are not reconstructed (same canonical-form contract as
    * [[TextFunctions.normalizedText]]).
    *
    * The reassembly filter is a per-document HOF over (token, index) pairs
    * probing the doc's OWN merged cut list (typically a handful of spans) —
    * interpreted, but O(tokens · spans) per affected document with no
    * shuffle; the corpus-wide work stays in the keyed stages above.
    */
  def stripRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 10, minCount: Int = 2,
      parallelism: Option[Int] = None): DataFrame = {
    val grams = gramTable(docs, idCol, textCol, k, parallelism)
    // keeper per duplicated gram = min (id, pos), folded into the SAME
    // aggregation as the occurrence count: min(struct) is map-side
    // combinable, so a boilerplate gram repeated millions of times costs
    // its partial-agg merges — a row_number window partitioned by fp would
    // hand one reducer the whole occurrence list (the skew hotspot this
    // module exists to avoid)
    val agg = grams.groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), min(struct(col("id"), col("pos"))).as("keep"))
      .where(col("n") >= minCount)
      .select(col("fp"), col("keep"))
    val losers = grams.join(agg, Seq("fp"))
      .where(col("id") =!= col("keep.id") || col("pos") =!= col("keep.pos"))
      .select(col("id"), col("pos"))
    val cuts = mergeSpans(losers, k)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("cut"),
        sum(col("span_tokens")).as("n_removed"))
    val toks = TextFunctions.tokens(col(textCol))
    docs.select(col(idCol).as("id"), toks.as("t"))
      .join(cuts, Seq("id"), "left")
      .select(col("id"), size(col("t")).cast("long").as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        array_join(
          when(col("cut").isNull, col("t")).otherwise(
            transform(
              filter(zip_with(col("t"), sequence(lit(1L), size(col("t")).cast("long")),
                  (tok, i) => struct(tok.as("tok"), i.as("i"))),
                x => !exists(col("cut"), s =>
                  x.getField("i").between(s.getField("span_start"), s.getField("span_end")))),
              x => x.getField("tok"))),
          " ").as("clean_text"))
  }
}
