package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.{Dedup, Similarity}
import graft.queries.Registry.tbl

/** Similarity search over the `embeddings` table (vec_id, array<float> x64,
  * label): exact brute-force cosine top-k (oracle-checked against DuckDB's
  * list_cosine_similarity) and the LSH-bucketed approximate scale path
  * (rows-only: approximation has no SQL-exact oracle).
  */
object VectorQueries {

  val qs: Seq[Q] = Seq(

    // ---- embedding norms / stats (vector math sanity + portability)
    Q("q40_embedding_stats", (s, d) => {
      val e = VectorFunctions.toDouble(col("embedding"))
      tbl(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(VectorFunctions.norm2(e), 4).as("l2_norm"),
        round(VectorFunctions.dot(e, e), 4).as("self_dot"))
        .orderBy(col("vec_id"))
    }, Some(
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        | ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS l2_norm,
        | ROUND(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 4) AS self_dot
        |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ---- exact cosine top-5 for 10 query vectors against the rest
    Q("q41_knn_bruteforce", (s, d) => {
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.bruteForceKnn(queries, corpus, k = 5)
        .select(col("qid"), col("nid"), round(col("sim"), 4).as("sim"))
        .orderBy(col("qid"), col("sim").desc, col("nid"))
    }, Some(
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id >= 10),
        |s AS (SELECT qid, nid, ROUND(list_cosine_similarity(q.e, c.e), 4) AS sim FROM q, c)
        |SELECT qid, nid, sim
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM s) t
        |WHERE rn <= 5 ORDER BY qid, sim DESC, nid""".stripMargin),
      bench = true),

    // ---- label centroids: groupBy over vector column with element-wise agg
    Q("q42_label_centroid_norm", (s, d) => {
      val e = tbl(s, d, "embeddings")
      // mean vector per label = element-wise sum / count, then its L2 norm.
      // posexplode → (label, pos) agg keeps the shuffle narrow: 64·|labels|.
      val exploded = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      exploded.groupBy(col("label"), col("pos"))
        .agg(sum(col("v").cast("decimal(28,10)")).cast("double").as("sv"),
          count(lit(1)).as("n"))
        .groupBy(col("label"))
        .agg(round(sqrt(sum(pow(col("sv") / col("n"), 2))), 4).as("centroid_norm"),
          max(col("n")).as("n_vectors"))
        .orderBy(col("label"))
    }, Some(
      """WITH ex AS (SELECT label, g.x AS pos, embedding[g.x] AS v
        |            FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(x)),
        |agg AS (SELECT label, pos,
        |          CAST(CAST(SUM(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sv, COUNT(*) AS n
        |        FROM ex GROUP BY label, pos)
        |SELECT label, ROUND(sqrt(SUM(power(sv / n, 2))), 4) AS centroid_norm,
        |  CAST(MAX(n) AS BIGINT) AS n_vectors
        |FROM agg GROUP BY label ORDER BY label""".stripMargin)),

    // ---- embedding-cosine near-duplicate detection (the vector-space twin
    // of MinHash dedup): LSH-bucketed candidate pairs + cosine verification.
    // Machine-checked CONTRACT form (the q43 pattern): the job computes the
    // exact all-pairs answer alongside (broadcast — verifier runs at
    // oracle-check scale only; the LSH path is the 100 TB plan, pinned in
    // PlanSpec) and emits containment (every emitted pair is truly ≥
    // threshold) + recall ≥ 95% — so a parameter tweak or data regen that
    // degrades the bucketing fails loudly, while the ~0.2%-per-pair
    // theoretical LSH miss cannot flip correctness by luck.
    // The corpus is AUGMENTED with 100 exact-copy twins (vec_id + 8.01e9 —
    // reproduced verbatim in the oracle SQL): the source embeddings have NO
    // cosine≥0.9 pairs at any SF (max natural cosine 0.60, measured round
    // 6), so without planting, n_exact = 0 and the recall clause is
    // vacuously true. With it, recall asserts 100 known pairs are found.
    Q("q44_embedding_near_dups", (s, d) => {
      import graft.functions.VectorFunctions._
      val emb = tbl(s, d, "embeddings")
      val aug = emb.select(col("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") < 100)
          .select((col("vec_id") + 8010000000L).as("vec_id"), col("embedding")))
      // bitsPerTable = 0: the auto-sized at-scale form (r9) — resolves to
      // the 4-bit floor at oracle SFs (identical output), grows with the
      // corpus beyond ~8k rows so the contract keeps meaning at any SF
      val approx = Dedup.embeddingNearDups(aug, "vec_id", "embedding",
        dim = 64, threshold = 0.9, bitsPerTable = 0)
      val e = toDouble(col("embedding"))
      // verifier width pin: the probe side otherwise inherits the 1-2
      // partition parquet scan, so at sf≥1 the all-pairs BNLJ baseline runs
      // its billions of pairs on 2 threads (observed: the r7 sf3 gate spent
      // ~1 h here). The verifier is oracle-check-only by design — but it
      // still has to FINISH at gate scale.
      val a = aug.select(col("vec_id").as("id_a"), e.as("ea"))
        .repartition(s.sparkContext.defaultParallelism)
      val b = aug.select(col("vec_id").as("id_b"), e.as("eb"))
      val exact = a.join(broadcast(b), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          cosineSimilarity(col("ea"), col("eb")).as("raw"))
        // cull before the 4-dp round: round(x,4) ≥ 0.9 ⟺ x ≥ 0.89995, so
        // raw ≥ 0.8999 keeps a strict superset — survivors get the
        // identical round+filter, and the per-pair BigDecimal rounding
        // runs on a sliver of the pair stream instead of all of it
        .where(col("raw") >= 0.8999)
        .select(col("id_a"), col("id_b"), round(col("raw"), 4).as("cos"))
        .where(col("cos") >= 0.9)
        .select(col("id_a"), col("id_b"))
      val found = approx.select(col("id_a"), col("id_b"))
      val hits = found.join(exact, Seq("id_a", "id_b"), "left_semi")
      val falsePos = found.join(exact, Seq("id_a", "id_b"), "left_anti")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .crossJoin(falsePos.agg(count(lit(1)).as("n_false")))
        .select(col("n_exact"),
          (col("n_hit") >= lit(0.95) * col("n_exact")).as("recall_ok"),
          (col("n_false") === 0).as("containment_ok"))
    }, Some(
      """WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 8010000000 AS vec_id, embedding FROM embeddings WHERE vec_id < 100),
        |exact AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
        |  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.9)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        |  TRUE AS recall_ok, TRUE AS containment_ok
        |FROM exact""".stripMargin)),

    // ---- SemDeDup-style semantic dedup (arXiv:2303.09540): KMeans cells +
    // within-cell banded cosine — the cluster-quantized alternative to
    // q44's sign-LSH buckets. Same machine-checked contract: containment is
    // exact (within-cell verify is a true cosine), recall vs the all-pairs
    // answer must clear 80% (cross-cell boundary splits are the method's
    // documented miss mode; q44's random hyperplanes and this quantizer
    // fail differently, which is why both ship). NOT benched: this query's
    // verification harness computes the exact all-pairs baseline — O(N²) by
    // design — so benching it measures the verifier, not the operator (the
    // round-6 sf1 run recorded 364 s here, ~90% of it the baseline). The
    // operator's scale surface is benched as q102, whose planted-pair
    // contract verifies in linear time. Same exact-copy augmentation as
    // q44 — without it n_exact = 0 and recall is vacuous.
    Q("q84_semantic_dedup", (s, d) => {
      import graft.functions.VectorFunctions._
      val emb = tbl(s, d, "embeddings")
      val aug = emb.select(col("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") < 100)
          .select((col("vec_id") + 8010000000L).as("vec_id"), col("embedding")))
      val approx = Similarity.semanticNearDups(aug, "vec_id", "embedding",
        threshold = 0.9)
      val e = toDouble(col("embedding"))
      // verifier width pin: the probe side otherwise inherits the 1-2
      // partition parquet scan, so at sf≥1 the all-pairs BNLJ baseline runs
      // its billions of pairs on 2 threads (observed: the r7 sf3 gate spent
      // ~1 h here). The verifier is oracle-check-only by design — but it
      // still has to FINISH at gate scale.
      val a = aug.select(col("vec_id").as("id_a"), e.as("ea"))
        .repartition(s.sparkContext.defaultParallelism)
      val b = aug.select(col("vec_id").as("id_b"), e.as("eb"))
      val exact = a.join(broadcast(b), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          cosineSimilarity(col("ea"), col("eb")).as("raw"))
        // cull before the 4-dp round: round(x,4) ≥ 0.9 ⟺ x ≥ 0.89995, so
        // raw ≥ 0.8999 keeps a strict superset — survivors get the
        // identical round+filter, and the per-pair BigDecimal rounding
        // runs on a sliver of the pair stream instead of all of it
        .where(col("raw") >= 0.8999)
        .select(col("id_a"), col("id_b"), round(col("raw"), 4).as("cos"))
        .where(col("cos") >= 0.9)
        .select(col("id_a"), col("id_b"))
      val found = approx.select(col("id_a"), col("id_b"))
      val hits = found.join(exact, Seq("id_a", "id_b"), "left_semi")
      val falsePos = found.join(exact, Seq("id_a", "id_b"), "left_anti")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .crossJoin(falsePos.agg(count(lit(1)).as("n_false")))
        .select(col("n_exact"),
          (col("n_hit") >= lit(0.8) * col("n_exact")).as("recall_ok"),
          (col("n_false") === 0).as("containment_ok"))
    }, Some(
      """WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 8010000000 AS vec_id, embedding FROM embeddings WHERE vec_id < 100),
        |exact AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
        |  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.9)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        |  TRUE AS recall_ok, TRUE AS containment_ok
        |FROM exact""".stripMargin)),

    // ---- Semantic dedup at scale: the SAME operator as q84, verified by a
    // contract whose cost is LINEAR in corpus size so the bench measures
    // the operator, not an all-pairs baseline. 100 noisy twins are planted
    // (vec_id + 8.01e9, hash-noise ±0.02/dim on unit-norm vectors ⇒ cosine ≥
    // 0.987 to the source BY CONSTRUCTION — worst-case all-dims-max noise
    // has norm 0.16, cos ≥ 1/√1.0256); the source corpus has no ≥0.9 pairs
    // (max natural cosine 0.60), so the planted set IS the known answer and
    // the oracle needs only its count — no pairwise work on either side.
    // Recall asserts ≥80% of planted pairs are found (quantizer cell splits
    // and band splits are the miss modes); containment asserts the full
    // output's min cosine clears the threshold (the operator's verify is an
    // exact cosine, so no banding/quantization path can emit a false pair).
    Q("q102_semantic_dedup_scale", (s, d) => {
      val emb = tbl(s, d, "embeddings")
      val twins = emb.filter(col("vec_id") < 100)
        .select((col("vec_id") + 8010000000L).as("vec_id"),
          transform(col("embedding"), (v, dim) =>
            (v + (pmod(hash(col("vec_id"), dim), lit(1000)) - 500)
              .cast("float") * lit(0.00004f)).cast("float")).as("embedding"))
      val aug = emb.select(col("vec_id"), col("embedding")).unionByName(twins)
      val approx = Similarity.semanticNearDups(aug, "vec_id", "embedding",
        threshold = 0.9)
      val planted = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("id_a"), (col("vec_id") + 8010000000L).as("id_b"))
      val hits = approx.select(col("id_a"), col("id_b"))
        .join(planted, Seq("id_a", "id_b"), "left_semi")
      planted.agg(count(lit(1)).as("n_planted"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .crossJoin(approx.agg(coalesce(min(col("cos")), lit(1.0)).as("min_cos")))
        .select(col("n_planted"),
          (col("n_hit") >= lit(0.8) * col("n_planted")).as("recall_ok"),
          (col("min_cos") >= 0.9).as("containment_ok"))
    }, Some(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
        |  TRUE AS recall_ok, TRUE AS containment_ok
        |FROM embeddings WHERE vec_id < 100""".stripMargin), bench = true),

    // ---- LSH-bucketed approximate NN: the 100 TB scale path. Oracle
    // contract (the q16 within-tolerance trick): the query emits the
    // measured recall@5 vs the exact brute-force top-5 computed in the same
    // job, plus `recall_ok` — DuckDB asserts the literal expectation, so a
    // recall regression is a hash MISMATCH, not an unchecked row count.
    Q("q43_knn_lsh_ann", (s, d) => {
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      // nPlanes = 0: the auto-sized at-scale form (r9) — the 4-plane floor
      // at oracle SFs (identical output), growing with the corpus beyond
      // ~8k vectors (measured 0.99/0.986 recall at sf10/sf20, SCALING.md)
      val approx = Similarity.lshAnn(queries, corpus, k = 5, nPlanes = 0, dim = 64,
        probeBits = 2)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
    }, Some(recallOracle)),

    // ---- IVF-bucketed approximate NN: KMeans coarse quantizer (fit on a
    // bounded sample) + nprobe cell scan; same machine-checked recall
    // contract as q43
    Q("q46_knn_ivf_ann", (s, d) => {
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      // nlist = 0 / nprobe = 4: the auto-sized cells with the EXACT probe
      // width the scale measurement used (AnnRecall: recall 1.000 at
      // sf10/sf20 with nprobe = 4 — citing a measured number obliges
      // running the measured configuration)
      val approx = Similarity.ivfAnn(queries, corpus, k = 5, nlist = 0, nprobe = 4)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
    }, Some(recallOracle)),

    // ---- PERSISTED IVF index: build once (centroids + corpus bucketed by
    // cell — the partition layout IS the index), then serve query batches
    // with partition-pruned probes that never re-fit or rescan unprobed
    // cells. Same machine-checked recall contract as q46; PlanSpec pins
    // that the probe scan reads only the probed cells' partitions.
    Q("q100_ivf_index_persisted", (s, d) => {
      val base = Registry.tmpDir("graft-q100-")
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      // nlist = 0 / nprobe = 4: auto-sized cells at the measured probe
      // width (the persisted-index serve path's 1.000 recall and 2.8-3.8 s
      // serve at sf10/sf20 were measured with nprobe = 4)
      Similarity.buildIvfIndex(corpus, s"$base/index", nlist = 0)
      val approx = Similarity.ivfIndexQuery(queries, s"$base/index", k = 5, nprobe = 4)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
    }, Some(recallOracle), bench = true),

    // ---- SHARDED persisted IVF index: the capacity path past nlistFor's
    // single-quantizer ceiling (~16M rows/shard) — one coarse quantizer
    // per id-hash shard, scatter-gather serve merging per-shard top-ks.
    // Same machine-checked recall contract; IvfIndexSpec additionally pins
    // that a full-probe merge reproduces the exact answer bit-for-bit and
    // that every shard carries (and enforces) its own geometry row.
    Q("q110_ivf_index_sharded", (s, d) => {
      val base = Registry.tmpDir("graft-q110-")
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      // nlist = 0: each shard auto-sizes cells to ITS row count; nprobe = 4
      // keeps the single-index measured probe width per shard
      Similarity.buildIvfIndexSharded(corpus, s"$base/index", nShards = 2, nlist = 0)
      val approx = Similarity.ivfIndexQuerySharded(queries, s"$base/index",
        k = 5, nprobe = 4)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
    }, Some(recallOracle)),

    // ---- INCREMENTAL ingest into the persisted IVF index (r11): a corpus
    // that grows daily appends assignment-only deltas (existing centroids,
    // no refit) under the CorpusIndex idempotent-delta protocol instead of
    // rebuilding; serving reads corpus ∪ deltas with the same cell pruning.
    // Built on a 60% id-hash draw, grown by two appended batches, then the
    // same machine-checked recall contract against the exact answer over
    // the FULL corpus — appended rows must be served like built rows
    // (IncrementalIvfSpec additionally pins full-probe exactness, replay
    // idempotence, compaction, and the dim/skew refusals).
    Q("q114_ivf_incremental", (s, d) => {
      val base = Registry.tmpDir("graft-q114-")
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      val built = corpus.filter(pmod(xxhash64(col("id")), lit(5)) < 3)
      Similarity.buildIvfIndex(built, s"$base/index", nlist = 0)
      Similarity.appendToIvfIndex(
        corpus.filter(pmod(xxhash64(col("id")), lit(5)) === 3),
        s"$base/index", deltaId = 0)
      Similarity.appendToIvfIndex(
        corpus.filter(pmod(xxhash64(col("id")), lit(5)) === 4),
        s"$base/index", deltaId = 1)
      val approx = Similarity.ivfIndexQuery(queries, s"$base/index", k = 5, nprobe = 4)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
    }, Some(recallOracle)),

    // ---- ROUTED (space-partitioned) sharded IVF (r11): a top-level
    // quantizer routes rows to shards at build and each query to its
    // `routeShards` nearest shards at serve — per-query cost drops from
    // O(nShards·nprobe·cellRows) to O(routeShards·…), the dial the
    // id-hash scatter cannot offer. Narrow routing (2 of 3 shards) must
    // still clear the recall contract; RoutedIvfSpec pins that full
    // routing equals the full scatter bit-for-bit.
    Q("q116_ivf_routed", (s, d) => {
      val base = Registry.tmpDir("graft-q116-")
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.buildIvfIndexRouted(corpus, s"$base/index", nShards = 3, nlist = 0)
      val approx = Similarity.ivfIndexQueryRouted(queries, s"$base/index",
        k = 5, nprobe = 4, routeShards = 2)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
    }, Some(recallOracle)),

    // ---- ERASURE PROPAGATION into a persisted index (r13): GDPR erasure
    // must reach every copy — [[graft.streaming.IndexErase]] copy-on-write
    // rewrites exactly the cell files holding erased ids (the lake-erase
    // two-phase protocol per component dir), geometry untouched. Pins:
    // bytes GONE from the raw data partitions (not serve-filtered), no
    // erased id ever served, and the surviving corpus still clears the
    // recall contract against brute force over the survivors.
    Q("q127_index_erasure", (s, d) => {
      val base = Registry.tmpDir("graft-q127-")
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.buildIvfIndex(corpus, s"$base/index", nlist = 0)
      val erased = corpus.where(pmod(col("id"), lit(7)) === 0).select(col("id"))
      graft.streaming.IndexErase.eraseFromIvfIndex(s, s"$base/index", erased)
      val bytesGone = s.read.parquet(s"$base/index/corpus")
        .join(erased.withColumnRenamed("id", "nid"), Seq("nid"), "left_semi")
        .count() == 0L
      val kept = corpus.join(erased, Seq("id"), "left_anti")
      val approx = Similarity.ivfIndexQuery(queries, s"$base/index", k = 5, nprobe = 4)
      val servedErased = approx
        .join(erased.withColumnRenamed("id", "nid"), Seq("nid"), "left_semi")
        .count()
      val exact = Similarity.bruteForceKnn(queries, kept, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
        .withColumn("no_erased_served", lit(servedErased == 0L))
        .withColumn("bytes_gone", lit(bytesGone))
    }, Some(
      """SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
        | CAST(5 AS INT) AS k, TRUE AS recall_ok,
        | TRUE AS no_erased_served, TRUE AS bytes_gone
        |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // ---- product-quantized ANN (flat): the memory-bound tier — the
    // candidate scan reads m-byte PQ codes (32× smaller than the raw
    // vectors at these defaults), ADC ranks via m table lookups per pair,
    // and only the top-(k·refine) sliver is reranked with exact cosine.
    // Same machine-checked recall contract as the other ANN tiers.
    Q("q105_pq_ann", (s, d) => {
      import graft.operators.PqIndex
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      val approx = PqIndex.pqAnn(queries, corpus, k = 5, dim = 64,
        m = 8, ksub = 64, refine = 8)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
    }, Some(recallOracle)),

    // ---- SQ8 scalar-quantized ANN (r11): per-dimension byte codes —
    // the scan-tier dial between full precision (8 B/dim) and PQ
    // (m bytes/vector). 8× fewer scan bytes with per-dim resolution
    // intact, so the contract is a TIGHTER recall floor than PQ's
    // (0.9 vs 0.5) against the same brute-force truth.
    Q("q120_sq8_ann", (s, d) => {
      import graft.operators.SqAnn
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      val approx = SqAnn.sq8Ann(queries, corpus, k = 5)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.9)
    }, Some(recallOracle)),

    // ---- PERSISTED IVF-SQ8 index (r11): q106's layout with the SQ8 scan
    // tier — probes read nprobe cells of 1-byte/dim CODES
    // (partition-pruned), ADC-rank, rerank survivors exactly. Geometry
    // (grid + dim + band) persists in sqmeta/; wrong-dim probes refused.
    // nprobe-recall floor matches the IVF tiers' (cell miss, not
    // quantization, is the recall risk — SQ8's scan tier is near-exact).
    Q("q121_sq_ivf_index", (s, d) => {
      import graft.operators.SqAnn
      val base = Registry.tmpDir("graft-q121-")
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      SqAnn.buildSqIvfIndex(corpus, s"$base/index", nlist = 8)
      val approx = SqAnn.sqIvfQuery(queries, s"$base/index", k = 5, nprobe = 3)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
    }, Some(recallOracle)),

    // ---- PERSISTED IVF-PQ index (q100's layout + q105's compression):
    // codes and vectors land partitioned by coarse cell; a serving probe
    // reads nprobe cells of CODES (partition-pruned), ADC-ranks, and
    // fetches full vectors only for ADC survivors. The 100 TB serving
    // pattern: the scan tier is m bytes/row and cache-resident, the
    // full-vector tier is touched O(|Q|·k·refine) rows per batch.
    Q("q106_pq_ivf_index", (s, d) => {
      import graft.operators.PqIndex
      val base = Registry.tmpDir("graft-q106-")
      val emb = tbl(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      PqIndex.buildPqIvfIndex(corpus, s"$base/index", dim = 64, nlist = 8,
        m = 8, ksub = 64)
      val approx = PqIndex.pqIvfQuery(queries, s"$base/index", k = 5,
        nprobe = 3, refine = 8)
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      recallContract(approx, exact, nQueries = 10, k = 5, minRecall = 0.5)
    }, Some(recallOracle)),

    // ---- streaming embedding near-dup against an ACCUMULATING sign-LSH
    // index (q79's vector counterpart): batches are bucketed map-side with
    // the deterministic hyperplanes (no model state), probed against every
    // earlier delta + themselves, cosine-verified, appended idempotently.
    // Contract: containment exact (every emitted pair truly ≥ threshold),
    // recall ≥ 95% vs the all-pairs answer computed in-job.
    Q("q89_stream_embedding_index", (s, d) => {
      import graft.functions.VectorFunctions._
      import graft.streaming.EmbeddingIndex
      val base = Registry.tmpDir("graft-q89-")
      val emb = tbl(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      // seed at the auto-sized geometry (bits resolve from the seed corpus
      // — the 4-bit floor at oracle SFs), then probe under the PERSISTED
      // geometry: the r9 contract that probes can never silently run under
      // different hyperplanes than the index
      EmbeddingIndex.seed(emb.where(col("vec_id") < 200), "vec_id", "embedding",
        dim = 64, s"$base/index", bitsPerTable = 0)
      val (gT, gBits, gDim) = EmbeddingIndex.readGeometry(s, s"$base/index").get
      def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit =
        Registry.stageOrderedFile(df, s"$base/src", name, mtime)
      val t0 = System.currentTimeMillis() - 600000
      stage(emb.where(col("vec_id") >= 200 && col("vec_id") < 350), "b0", t0)
      stage(emb.where(col("vec_id") >= 350 && col("vec_id") < 500), "b1", t0 + 2000)
      val stream = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
      EmbeddingIndex.start(stream, "vec_id", "embedding", gDim,
        s"$base/index", s"$base/pairs", s"$base/ck", threshold = 0.9,
        nTables = gT, bitsPerTable = gBits)
        .awaitTermination()
      val found = s.read
        .schema("id_new long, id_other long, cos double, batch long")
        .parquet(s"$base/pairs")
        .select(col("id_other").as("id_a"), col("id_new").as("id_b"))
      val all = emb.where(col("vec_id") < 500)
      val e = toDouble(col("embedding"))
      val a = all.select(col("vec_id").as("id_a"), e.as("ea"))
      val b = all.select(col("vec_id").as("id_b"), e.as("eb"))
      // pairs INTERNAL to the seed predate the stream (a production seed
      // is already deduped); the streaming contract covers every pair
      // whose later side arrived in a batch: id_b >= 200
      val exact = a.join(broadcast(b),
          col("id_a") < col("id_b") && col("id_b") >= 200)
        .select(col("id_a"), col("id_b"),
          cosineSimilarity(col("ea"), col("eb")).as("raw"))
        // cull before the 4-dp round: round(x,4) ≥ 0.9 ⟺ x ≥ 0.89995, so
        // raw ≥ 0.8999 keeps a strict superset — survivors get the
        // identical round+filter, and the per-pair BigDecimal rounding
        // runs on a sliver of the pair stream instead of all of it
        .where(col("raw") >= 0.8999)
        .select(col("id_a"), col("id_b"), round(col("raw"), 4).as("cos"))
        .where(col("cos") >= 0.9)
        .select(col("id_a"), col("id_b"))
      val hits = found.join(exact, Seq("id_a", "id_b"), "left_semi")
      val falsePos = found.join(exact, Seq("id_a", "id_b"), "left_anti")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .crossJoin(falsePos.agg(count(lit(1)).as("n_false")))
        .select(col("n_exact"),
          (col("n_hit") >= lit(0.95) * col("n_exact")).as("recall_ok"),
          (col("n_false") === 0).as("containment_ok"))
    }, Some(
      """WITH exact AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE a.vec_id < 500 AND b.vec_id < 500 AND b.vec_id >= 200
        |    AND ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.9)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        |  TRUE AS recall_ok, TRUE AS containment_ok
        |FROM exact""".stripMargin))
  )

  /** One-row recall report: |approx ∩ exact| / |exact| over all queries,
    * asserted against `minRecall`. Joined on (qid, nid) — similarity values
    * don't need to agree beyond identifying the same neighbor set.
    */
  private def recallContract(approx: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame,
      nQueries: Int, k: Int, minRecall: Double): org.apache.spark.sql.DataFrame = {
    // single pass over each side: the exact top-k (a full brute-force scan)
    // is marked by an outer join against the approx ids and aggregated
    // once — the semi-join + separate total-agg form computed the exact
    // side TWICE per contract check. Both sides are unique on (qid, nid)
    // (top-k windows emit each neighbor once), so the outer join preserves
    // the exact side's cardinality.
    val marked = exact.select(col("qid"), col("nid")).join(
      approx.select(col("qid"), col("nid"), lit(1).as("__hit")),
      Seq("qid", "nid"), "left_outer")
    marked.agg(countDistinct(col("qid")).as("n_queries"),
        count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hit"))
      .select(col("n_queries"),
        lit(k).cast("int").as("k"),
        (col("n_hit") >= lit(minRecall) * col("n_exact")).as("recall_ok"))
  }

  // def, not val: referenced from `qs` above — a val would still be null
  // during object initialization
  private def recallOracle: String =
    """SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
      | CAST(5 AS INT) AS k, TRUE AS recall_ok
      |FROM embeddings WHERE vec_id < 10""".stripMargin
}
