package graft

import org.apache.spark.sql.functions._
import graft.functions.PqFunctions._
import graft.functions.VectorFunctions._
import graft.operators.{PqIndex, Similarity}

/** Product-quantization primitives + the PQ ANN tiers.
  *
  * The expression-level tests pin the ADC algebra: for any (vector,
  * codebooks), pq_adc(pq_encode(x), pq_table(q)) must equal the exact
  * inner product ⟨q_norm, decode(encode(x_norm))⟩ — i.e. ADC error is
  * EXACTLY quantization error, nothing else. The operator-level tests pin
  * recall against brute force on the real embeddings table.
  */
class PqSpec extends SparkSuite {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("l2_normalize: unit norm, degenerate vectors null out") {
    val rows = Seq(
      (1L, Seq(3.0f, 4.0f)),
      (2L, Seq(0.0f, 0.0f)),      // zero vector → null
      (3L, Seq(1.0f))
    ).toDF("id", "v")
    val got = rows.select($"id", l2_normalize($"v").as("n")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(2L).isEmpty)
    val n1 = got(1L).get.asInstanceOf[scala.collection.Seq[Double]]
    assert(math.abs(n1(0) - 0.6) < 1e-12 && math.abs(n1(1) - 0.8) < 1e-12)
    assert(got(3L).get.asInstanceOf[scala.collection.Seq[Double]].head == 1.0)
  }

  test("encode → table → adc equals the exact reconstructed inner product") {
    // tiny hand-built codebooks: dim 4, m 2, ksub 2, dsub 2
    val books = Array[Double](
      1.0, 0.0, /*j0 c0*/ 0.0, 1.0, /*j0 c1*/
      0.5, 0.5, /*j1 c0*/ -0.5, 0.5 /*j1 c1*/)
    val cb = typedLit(books.toSeq)
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 0.4f, 0.6f)),
      (2L, Seq(0.1f, 0.9f, -0.3f, 0.4f))
    ).toDF("id", "v")
    val enc = df.select($"id", pq_encode(l2_normalize($"v"), cb, 2, 2).as("code"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("code")).toMap
    // row 1 normalized ≈ (.73,.08,.33,.49): j0 nearest (1,0)→0; j1 nearest (.5,.5)→0
    assert(enc(1L).toSeq == Seq[Byte](0, 0))
    // row 2 normalized ≈ (.10,.86,-.29,.38): j0 → (0,1)=1; j1 → (-.5,.5)=1
    assert(enc(2L).toSeq == Seq[Byte](1, 1))
    // ADC = Σ_j ⟨q_j, C[j][code_j]⟩ exactly
    val q = Seq((10L, Seq(0.5f, 0.5f, 0.5f, 0.5f))).toDF("qid", "v")
      .select($"qid", pq_table(l2_normalize($"v"), cb, 2, 2).as("tbl"))
    val adc = df.select($"id", pq_encode(l2_normalize($"v"), cb, 2, 2).as("code"))
      .crossJoin(q)
      .select($"id", pq_adc($"code", $"tbl").as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // q normalized = (.5,.5,.5,.5); code(1)=(0,0) → ⟨(.5,.5),(1,0)⟩+⟨(.5,.5),(.5,.5)⟩ = .5+.5
    assert(math.abs(adc(1L) - 1.0) < 1e-12)
    // code(2)=(1,1) → ⟨(.5,.5),(0,1)⟩+⟨(.5,.5),(-.5,.5)⟩ = .5+0
    assert(math.abs(adc(2L) - 0.5) < 1e-12)
  }

  test("shape mismatches null out instead of throwing") {
    val cb = typedLit(Seq(1.0, 0.0, 0.0, 1.0)) // m=1, ksub=2, dsub=2
    val df = Seq((1L, Seq(1.0f, 0.0f, 0.0f))).toDF("id", "v") // dim 3 % m=2 ≠ 0
    val out = df.select(pq_encode($"v", cb, 2, 2).as("bad_dim")).collect().head
    assert(out.isNullAt(0)) // dim 3 does not divide into m=2 subspaces
    // a valid m=1,ksub=1,dsub=3 encoding against a table whose length is
    // not a multiple of the code length nulls out at the ADC stage
    val out2 = df.select(
      pq_adc(pq_encode($"v", typedLit(Seq(1.0, 0.0, 0.0)), 1, 1),
        typedLit(Seq(1.0, 2.0))).as("ok_adc"),
      pq_adc(lit(Array.empty[Byte]), typedLit(Seq(1.0, 2.0))).as("empty_code"))
      .collect().head
    assert(!out2.isNullAt(0)) // m=1 divides 2: ksub=2, code 0 → table[0]
    assert(out2.isNullAt(1))  // zero-length code carries no information
  }

  test("pqAnn recall vs brute force on the real embeddings table") {
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding")
    val corpus = emb.filter($"vec_id" >= 10)
      .select($"vec_id".as("id"), $"embedding")
    val approx = PqIndex.pqAnn(queries, corpus, k = 5, dim = 64,
      m = 8, ksub = 64, refine = 8)
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
    val hits = approx.select($"qid", $"nid")
      .join(exact.select($"qid", $"nid"), Seq("qid", "nid"), "left_semi").count()
    val total = exact.count()
    assert(total == 50, s"expected 10 queries × 5, got $total")
    assert(hits >= (0.5 * total).toLong, s"recall ${hits.toDouble / total} < 0.5")
    // emitted similarities are TRUE cosines (rerank is exact): spot-check
    // against a recomputed cosine for every returned pair
    val e = toDouble($"embedding")
    val full = emb.select($"vec_id".as("nid"), e.as("ne"))
    val qfull = emb.select($"vec_id".as("qid"), e.as("qe"))
    val bad = approx.join(full, Seq("nid")).join(qfull, Seq("qid"))
      .select(($"sim" - dot($"qe", $"ne") / (norm2($"qe") * norm2($"ne"))).as("err"))
      .where(abs($"err") > 1e-9)
    assert(bad.count() == 0)
  }

  test("persisted IVF-PQ index: build once, serve with pruned reads") {
    val base = tmpDir("graft-pqivf-")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding")
    val corpus = emb.filter($"vec_id" >= 10)
      .select($"vec_id".as("id"), $"embedding")
    PqIndex.buildPqIvfIndex(corpus, s"$base/index", dim = 64, nlist = 4,
      m = 8, ksub = 64)
    // codes tier stores only (nid, code): m bytes of payload per row
    val codes = spark.read.parquet(s"$base/index/codes")
    assert(codes.columns.sorted.toSeq == Seq("cell", "code", "nid"))
    assert(codes.select(max(length($"code"))).head().getInt(0) == 8)
    val approx = PqIndex.pqIvfQuery(queries, s"$base/index", k = 5,
      nprobe = 2, refine = 8)
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
    val hits = approx.select($"qid", $"nid")
      .join(exact.select($"qid", $"nid"), Seq("qid", "nid"), "left_semi").count()
    assert(hits >= (0.5 * exact.count()).toLong)
    // serving reads only probed cells: with nlist=4, nprobe=2, SOME cell
    // must be unprobed for 10 spread queries to actually prune — weaker
    // but deterministic: result count is exactly |Q|·k when corpus ≫ k
    assert(approx.groupBy($"qid").count().select(max($"count")).head().getLong(0) <= 5)
    // the distortion band is an index-build artifact: persisted with the
    // codebooks, strictly positive on a lossy quantizer
    val meta = spark.read.parquet(s"$base/index/codebooks").head()
    assert(meta.getAs[Double]("band") > 0.0)
  }

  test("pre-band index: refused by default, serves only with explicit opt-in") {
    val base = tmpDir("graft-pqivf-compat-")
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding")
    val corpus = emb.filter($"vec_id" >= 5)
      .select($"vec_id".as("id"), $"embedding")
    PqIndex.buildPqIvfIndex(corpus, s"$base/index", dim = 64, nlist = 4,
      m = 8, ksub = 64)
    // rewrite the codebooks row in the pre-r7 shape (no band column)
    val old = spark.read.parquet(s"$base/index/codebooks")
      .select($"m", $"ksub", $"books").collect().toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(old, 1),
        spark.read.parquet(s"$base/index/codebooks").select($"m", $"ksub", $"books").schema)
      .write.mode("overwrite").parquet(s"$base/index/codebooks")
    // default: REFUSE — a pre-band index can only serve the fixed k·refine
    // cut, whose recall is measured collapsing at scale (0.268@sf20); the
    // exception names the rebuild path
    val ex = intercept[IllegalStateException] {
      PqIndex.pqIvfQuery(queries, s"$base/index", k = 5, nprobe = 2, refine = 8)
    }
    assert(ex.getMessage.contains("buildPqIvfIndex"))
    // explicit opt-in: serves with band = 0.0 (warning fires on stderr)
    val approx = PqIndex.pqIvfQuery(queries, s"$base/index", k = 5,
      nprobe = 2, refine = 8, allowPreBandIndex = true)
    assert(approx.count() > 0)
    assert(approx.groupBy($"qid").count().select(max($"count")).head().getLong(0) <= 5)
  }

  test("band-adaptive rerank: recall survives a confusable cluster larger than k·refine") {
    // The sf10 scale failure mode, reproduced small: one source vector with
    // 150 near-identical replicas (mutual cosine ≥ 0.99) in a corpus whose
    // other vectors are far away. The true top-5 are 5 of the 150; ADC
    // quantization error swamps the within-cluster score differences, so a
    // FIXED cut at k·refine = 40 candidates keeps an arbitrary 40 of the
    // 150 and recall collapses toward 40/150. The band cut must widen the
    // rerank to cover the whole ADC-confusable cluster.
    val rnd = new scala.util.Random(7)
    def randVec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val baseVec = randVec()
    val replicas = (0 until 150).map { i =>
      (1000L + i, baseVec.map(v => v + rnd.nextGaussian().toFloat * 0.02f).toSeq)
    }
    val background = (0 until 2000).map(i => (2000L + i, randVec().toSeq))
    val corpus = (replicas ++ background).toDF("id", "embedding")
    val queries = Seq((0L, baseVec.toSeq)).toDF("qid", "embedding")
    val approx = PqIndex.pqAnn(queries, corpus, k = 5, dim = 64,
      m = 8, ksub = 64, refine = 8)
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
    val hits = approx.select($"qid", $"nid")
      .join(exact.select($"qid", $"nid"), Seq("qid", "nid"), "left_semi").count()
    assert(hits >= 4, s"banded recall ${hits / 5.0} < 0.8 on the confusable cluster")
    // and the cut stays BOUNDED: exactly k rows come back per query
    assert(approx.count() == 5)
  }
}
