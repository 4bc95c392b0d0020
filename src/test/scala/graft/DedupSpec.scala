package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SimHash, Similarity}

/** Near-dup and similarity operator behavior on planted duplicates. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    // plant: exact dup of doc 0, near dup (suffix) of docs 0..9
    val exact = base.filter($"doc_id" === 0)
      .select(($"doc_id" + 1000).as("doc_id"), $"text")
    val near = base.filter($"doc_id" < 10)
      .select(($"doc_id" + 2000).as("doc_id"),
        concat($"text", lit(" tiny suffix change")).as("text"))
    base.unionByName(exact).unionByName(near).cache()
  }

  test("exact dedup groups identical texts under one fingerprint") {
    val dups = Dedup.exact(docs, "doc_id", "text").filter($"dup_count" > 1)
    val row = dups.select($"keep_id", $"dup_count").as[(Long, Long)].collect()
    assert(row.toSeq == Seq((0L, 2L))) // doc 0 + its planted copy only
  }

  test("MinHash LSH finds planted near-dup pairs with no false negatives") {
    val pairs = Dedup.lshCandidates(Dedup.lshBands(Dedup.minhashSignatures(
      Dedup.shingleTable(docs, "doc_id", "text"), k = 16), rowsPerBand = 4))
      .as[(Long, Long)].collect().toSet
    // every planted near pair (i, i+2000) must be a candidate
    (0L to 9L).foreach { i => assert(pairs.contains((i, i + 2000)), s"missing pair $i") }
    // and the exact dup too
    assert(pairs.contains((0L, 1000L)))
  }

  test("Jaccard verification scores planted near-dups high and others low") {
    val near = Dedup.jaccardNearDups(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    // planted pairs: (0,1000) exact, (i,i+2000) near ×10, and (1000,2000)
    // transitively (copy-of-0 vs near-dup-of-0). The corpus also carries its
    // own organic near-dups (the datagen plants them for dedup ops), so we
    // assert our planted pairs are found — not exclusivity.
    val nearMap = near.map { case (a, b, j) => ((a, b), j) }.toMap
    val expected = ((0L to 9L).map(i => (i, i + 2000)) ++ Seq((0L, 1000L), (1000L, 2000L)))
    expected.foreach { p =>
      assert(nearMap.contains(p) && nearMap(p) > 0.8, s"pair $p: ${nearMap.get(p)}")
    }
    assert(nearMap((0L, 1000L)) == 1.0)
  }

  test("SimHash: exact dup distance 0; near dups within 6 bits") {
    val bits = SimHash.fingerprintBits(docs, "doc_id", "text").cache()
    val pairs = ((0L to 9L).map(i => (i, i + 2000)) :+ ((0L, 1000L)))
      .toDF("id_a", "id_b")
    val ham = SimHash.hammingOnPairs(pairs, bits)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => ((a, b), h) }.toMap
    assert(ham((0L, 1000L)) == 0L)
    (0L to 9L).foreach(i => assert(ham((i, i + 2000)) <= 6, s"pair $i too far: ${ham((i, i + 2000))}"))
  }

  test("IVF ANN recall ≥ 0.6 vs brute force on sf0.001 embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20).select($"vec_id".as("qid"), $"embedding")
    val corpus = emb.filter($"vec_id" >= 20).select($"vec_id".as("id"), $"embedding")
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfAnn(queries, corpus, k = 5, nlist = 8, nprobe = 3)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("LSH ANN recall ≥ 0.6 vs brute force on sf0.001 embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20).select($"vec_id".as("qid"), $"embedding")
    val corpus = emb.filter($"vec_id" >= 20).select($"vec_id".as("id"), $"embedding")
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshAnn(queries, corpus, k = 5, nPlanes = 3, dim = 64)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("LSH width scales with corpus size (buckets grow, clamped)") {
    import graft.operators.Dedup.bitsPerTableFor
    assert(bitsPerTableFor(1000) == 4)            // small corpora keep the floor
    assert(bitsPerTableFor(1000000) == 11)        // 1M / 512 ≈ 2^11
    assert(bitsPerTableFor(100000000000L) == 24)  // clamped ceiling at 100B rows
    // monotone: more rows never means fewer buckets
    val widths = Seq(1L, 10000L, 1000000L, 100000000L).map(bitsPerTableFor(_))
    assert(widths == widths.sorted)
  }

  test("incremental dedup classifies a new batch against the corpus index") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different corpus text about spark query engines and scale")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank"), // known
      (11L, "a genuinely new document with its own words and content entirely"),
      (12L, "a genuinely new document with its own words and content entirely"), // batch dup of 11
      (13L, "the quick brown fox jumps over the lazy dog near the river edge")  // near dup of corpus 1
    ).toDF("doc_id", "text")
    val fps = corpus.select(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
    val verdicts = Dedup.incrementalExact(batch, "doc_id", "text", fps)
      .select($"id", $"verdict").as[(Long, String)].collect().toMap
    assert(verdicts == Map(10L -> "known_dup", 11L -> "new", 12L -> "batch_dup", 13L -> "new"))

    val near = Dedup.incrementalNearDups(
      Dedup.minhashBands(Dedup.shingleTable(batch, "doc_id", "text", 3), 16, 2),
      Dedup.shingleArrays(batch, "doc_id", "text", 3),
      Dedup.minhashBands(Dedup.shingleTable(corpus, "doc_id", "text", 3), 16, 2),
      Dedup.shingleArrays(corpus, "doc_id", "text", 3), threshold = 0.5)
      .select($"id_new", $"id_other").as[(Long, Long)].collect().toSet
    assert(near.contains((13L, 1L)), s"near-dup vs corpus missed: $near")
    assert(near.contains((12L, 11L)), s"in-batch exact pair must also surface: $near")
    assert(!near.exists { case (a, b) => b == 2L }, s"unrelated corpus doc paired: $near")
  }

  test("hot-bucket cap bounds candidate pairs under a near-identical flood") {
    def words(seed: String) = (1 to 30).map(i => s"$seed$i").mkString(" ")
    // a 12-doc flood of the same template + one ordinary near-dup pair
    val flood = (0 until 12).map(i => (100L + i, words("tmpl") + s" v$i"))
    val pair = Seq((1L, words("alpha")), (2L, words("alpha") + " tail"))
    val d = (flood ++ pair).toDF("doc_id", "text")
    val arrays = Dedup.shingleArrays(d, "doc_id", "text", n = 3)
    val bands = Dedup.minhashBandsNarrow(arrays, 16, 2)
    val unbounded = Dedup.lshCandidates(bands).count()
    val capped = Dedup.lshCandidates(bands, maxBucketSize = Some(8))
    // the flood's C(12,2)=66-pair buckets are skipped; the small pair survives
    assert(capped.count() < unbounded)
    assert(capped.select($"id_a", $"id_b").as[(Long, Long)].collect()
      .contains((1L, 2L)), "ordinary pairs must survive the cap")
  }

  test("decontamination flags 8-gram overlap with the benchmark, broadcast-shaped") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "totally separate training text with no overlap against the benchmark suite here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "question: alpha beta gamma delta epsilon zeta eta theta answer: yes"),
      (101L, "unrelated benchmark prompt about completely other things entirely different words")
    ).toDF("doc_id", "text")
    val hits = Dedup.contamination(train, "doc_id", "text", bench, "doc_id", "text", n = 8)
      .select($"train_id", $"bench_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 100L)), s"got $hits")
    // plan shape: the benchmark side must broadcast (training data never shuffles)
    val plan = Dedup.contamination(train, "doc_id", "text", bench, "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("pipeline banding catches mid-similarity near-dups at the default threshold") {
    // planted pair at J = 7/11 ≈ 0.64: with 16 hashes, bands of 4 sit on an
    // S-curve midpoint of 0.707 and would miss most such pairs; the
    // threshold-matched default (bands of 2, midpoint 0.354) must catch it
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota new tail"),
      (3L, "completely different text about unrelated topics and content here")
    ).toDF("doc_id", "text")
    val ann = graft.operators.CorpusPipeline.annotate(docs,
      graft.operators.CorpusPipeline.Config(minQuality = 0.0, minTokens = 1,
        languages = Seq("en", "und", "es", "de", "fr")))
    val reasons = ann.select($"doc_id", $"reject_reason")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(reasons(2L).contains("near_dup"),
      s"J≈0.64 pair must be caught by threshold-matched banding, got $reasons")
    assert(reasons(1L).isEmpty, "the smaller id of the pair survives")
    assert(reasons(3L).isEmpty, "unrelated doc must not be paired")
  }

  test("connected components collapse overlapping pairs into clusters") {
    // path 1-2-3-4-5 (diameter 4 forces several propagation rounds), an
    // isolated pair, and a star — pairwise drop-the-larger would over-drop
    // the path's middle; components must label every member with the min id
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L), (20L, 22L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L), s"got $got")
  }

  test("cluster convergence on a long path needs more than one round") {
    // 12-vertex path: hash-min propagates one hop per round, so this
    // exercises the iteration + localCheckpoint loop well past round 1.
    // localEdgeLimit = 0 pins the DISTRIBUTED path — the r14 local
    // union-find fast path would otherwise absorb this graph
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs, localEdgeLimit = 0L).as[(Long, Long)].collect()
    assert(got.length == 12 && got.forall(_._2 == 0L),
      s"all path members must reach label 0, got ${got.filter(_._2 != 0L).toSeq}")
  }

  test("local union-find fast path is identical to the distributed loop") {
    // pseudo-random graph with chains, stars, dups and self-contained
    // components; seeded so the case is reproducible
    val rnd = new scala.util.Random(271828)
    val pairs = Seq.fill(400)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("id_a", "id_b")
    val local = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.clusters(pairs, localEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, s"local/distributed divergence: " +
      s"${(local.toSet diff dist.toSet).take(5)} vs ${(dist.toSet diff local.toSet).take(5)}")
  }

  test("local fast path: empty pair set yields an empty labeling") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusters(pairs).count() == 0L)
  }

  test("near-decontamination flags mutated bench copies, not clean docs") {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val bench = base.filter($"doc_id" < 5)
    // a mutated copy: every 20th token replaced — zero shared 8-grams
    // around each mutation site, but 3-gram Jaccard ≈ 0.74
    val planted = bench.select(($"doc_id" + 5000L).as("doc_id"),
      array_join(transform(split($"text", " "),
        (w, i) => when(i % 20 === 3, lit("zz")).otherwise(w)), " ").as("text"))
    val train = base.filter($"doc_id" >= 5 && $"doc_id" < 100)
      .unionByName(planted)
    val flagged = Dedup.nearContamination(train, "doc_id", "text",
      bench, "doc_id", "text", n = 3, k = 16, rowsPerBand = 2, threshold = 0.5)
      .cache()
    val plantedHits = flagged.filter($"train_id" >= 5000L)
      .select($"train_id", $"bench_id").as[(Long, Long)].collect().toSet
    // every planted copy is flagged AGAINST ITS OWN source
    assert((0L until 5L).forall(i => plantedHits.contains((i + 5000L, i))),
      s"missing planted hits: $plantedHits")
    // every emitted pair's Jaccard is exact and clears the threshold
    assert(flagged.filter($"jaccard" < 0.5).count() == 0)
    // clean docs flagged only if they truly share ≥0.5 Jaccard (verify is
    // exact, so any such hit is legitimate — recompute one to confirm)
    val clean = flagged.filter($"train_id" < 5000L)
    val arrays = Dedup.shingleArrays(
      train.unionByName(bench.select($"doc_id", $"text")), "doc_id", "text")
    val recheck = Dedup.jaccardOnArrays(
      clean.select($"train_id".as("id_a"), $"bench_id".as("id_b")), arrays)
    assert(recheck.filter($"jaccard" < 0.5).count() == 0)
    flagged.unpersist()
    ()
  }
}
