package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Contract for q108's production LSH bucket cap (`Dedup.lshCandidates`
  * maxBucketSize): the cap must kill the quadratic template-flood pair
  * blowup WITHOUT losing true near-dup pairs between distinct documents.
  * The sf10/sf20 divergence measurement lives in `tools/CapRecall`; this
  * spec pins the same contract small and deterministic:
  *
  *   - a planted flood family (template spam: one template, many members
  *     with small member-specific mutations) produces a quadratic exact
  *     candidate set, and the cap collapses it;
  *   - every planted near-dup pair OUTSIDE the flood survives the cap
  *     verbatim — their buckets are pair-sized, nowhere near the cap;
  *   - verified (jaccard >= 0.5) pairs outside the flood are IDENTICAL
  *     between exact and capped modes — the cap's divergence is confined
  *     to flood-internal pairs by construction.
  */
class CapRecallSpec extends SparkSuite {
  import spark.implicits._

  private val Cap = 64
  private val FloodSize = 200
  private val NearPairs = 10

  // Deterministic synthetic corpus over disjoint vocabulary ranges so the
  // flood and the distinct docs can never share a shingle.
  private lazy val docs = {
    // 30 pairwise-dissimilar base docs: doc i = 60 words from a stride of
    // the "base" vocab. Strides coprime with the vocab size keep overlap
    // between docs' shingle sets negligible.
    val base = (0 until 30).map { i =>
      val words = (0 until 60).map(j => s"b${(i * 97 + j * 13) % 991}")
      (i.toLong, words.mkString(" "))
    }
    // true near-dups: a copy of base doc i with its last 5 words replaced
    // (jaccard well above 0.5, far below 1.0)
    val near = (0 until NearPairs).map { i =>
      val words = (0 until 55).map(j => s"b${(i * 97 + j * 13) % 991}") ++
        (0 until 5).map(j => s"n$i-$j")
      (10000L + i, words.mkString(" "))
    }
    // flood family: one 60-word template; member m mutates 2 scattered
    // positions with member-private tokens → high mutual similarity
    // (template spam), LSH buckets well past the cap, C(n,2) exact
    // candidates
    val flood = (0 until FloodSize).map { m =>
      val words = (0 until 60).map { j =>
        if ((j * 31 + m) % 30 == 0) s"f$m-$j" else s"t${j}"
      }
      (20000L + m, words.mkString(" "))
    }
    (base ++ near ++ flood).toDF("doc_id", "text")
  }

  private def isFlood(id: Long): Boolean = id >= 20000L

  private lazy val arrays =
    Dedup.shingleArrays(docs, "doc_id", "text", n = 3).localCheckpoint()
  private lazy val bands =
    Dedup.minhashBandsNarrow(arrays, k = 16, rowsPerBand = 2).localCheckpoint()

  private def verifiedPairs(maxBucket: Option[Int]): Set[(Long, Long)] =
    Dedup.jaccardOnArrays(Dedup.lshCandidates(bands, maxBucket), arrays)
      .where(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet

  test("cap collapses the flood's quadratic candidate set") {
    val exactFlood = Dedup.lshCandidates(bands, None)
      .where(col("id_a") >= 20000L && col("id_b") >= 20000L).count()
    val cappedFlood = Dedup.lshCandidates(bands, Some(Cap))
      .where(col("id_a") >= 20000L && col("id_b") >= 20000L).count()
    // exact mode goes quadratic in the family (>= 25% of all C(200,2)
    // pairs become candidates); the cap must cut that by >= 10×
    val allPairs = FloodSize.toLong * (FloodSize - 1) / 2
    assert(exactFlood >= allPairs / 4,
      s"flood fixture too weak: $exactFlood of $allPairs exact candidates")
    assert(cappedFlood <= exactFlood / 10,
      s"cap did not collapse the flood: $cappedFlood vs exact $exactFlood")
  }

  test("every planted non-flood near-dup pair survives the cap") {
    val capped = verifiedPairs(Some(Cap))
    (0 until NearPairs).foreach { i =>
      assert(capped.contains((i.toLong, 10000L + i)), s"lost planted pair $i")
    }
  }

  test("verified pairs outside the flood are identical exact vs capped") {
    val exact = verifiedPairs(None).filterNot(p => isFlood(p._1) || isFlood(p._2))
    val capped = verifiedPairs(Some(Cap)).filterNot(p => isFlood(p._1) || isFlood(p._2))
    assert(exact == capped,
      s"non-flood divergence: missing=${exact -- capped} extra=${capped -- exact}")
    assert(exact.size >= NearPairs) // the planted pairs are actually in play
  }

  test("Config.production output equals the oracle-exact config on the oracle corpus") {
    // The q108 contract spelled as API: on the oracle corpus (sf0.001
    // documents + the registry's planted exact/near duplicates — no LSH
    // bucket near the cap), the production profile (bucket cap +
    // fingerprint verify) must produce the BYTE-IDENTICAL annotation the
    // exact mode produces. Divergence is confined by design to flooded
    // buckets, which this corpus has none of.
    import graft.operators.CorpusPipeline
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.unionByName(
      docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          concat(col("text"), lit(" graft extra trailing words")).as("text")))
      .unionByName(docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 2000000000L).as("doc_id"), col("text")))
    def rows(cfg: CorpusPipeline.Config): Seq[String] =
      CorpusPipeline.annotate(planted, cfg)
        .orderBy(col("doc_id"))
        .collect().map(_.mkString("|")).toSeq
    assert(rows(CorpusPipeline.Config.production()) == rows(CorpusPipeline.Config()))
  }
}
