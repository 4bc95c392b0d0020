package graft

import org.apache.spark.sql.functions._

import graft.functions.SqFunctions
import graft.functions.SqFunctions.Sq8Grid
import graft.operators.{Similarity, SqAnn}

/** SQ8 scalar quantization: encode/ADC algebra, the closed-form error
  * band, and top-k parity with brute force through the exact rerank.
  */
class SqAnnSpec extends SparkSuite {
  import spark.implicits._

  test("encode/adc roundtrip: dequantized dot within the closed-form band") {
    val rnd = new scala.util.Random(5)
    val dim = 16
    val vecs = Seq.fill(50)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
      .map { v => // normalize
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }
    val lo = Array.tabulate(dim)(i => vecs.map(_(i)).min)
    val hi = Array.tabulate(dim)(i => vecs.map(_(i)).max)
    val grid = new Sq8Grid(lo, Array.tabulate(dim)(i => math.max((hi(i) - lo(i)) / 255.0, 1e-12)))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "e")
    val got = df.select(col("id"),
        SqFunctions.sq8Adc(
          SqFunctions.sq8Encode(col("e"), grid), col("e"), grid).as("adc"))
      .orderBy("id").select("adc").as[Double].collect()
    vecs.zip(got).foreach { case (v, adc) =>
      val exact = v.map(x => x * x).sum // self-dot = 1 for unit vectors
      assert(math.abs(adc - exact) <= grid.band + 1e-12,
        s"|adc-exact|=${math.abs(adc - exact)} exceeded band=${grid.band}")
    }
    // saturation, not wraparound, outside the fitted range
    val outside = Seq((0L, Seq.fill(dim)(99.0))).toDF("id", "e")
    val code = outside.select(
      SqFunctions.sq8Encode(col("e"), grid)).head.getAs[Array[Byte]](0)
    assert(code.forall(b => (b & 0xff) == 255))
  }

  test("sq8Ann top-k matches brute force on the embeddings table") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    val approx = SqAnn.sq8Ann(queries, corpus, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall $recall below floor") // near-exact tier
    assert(approx.size == exact.size)
  }

  test("persisted IVF-SQ8: full-probe serve == brute force; wrong-dim refused") {
    val base = tmpDir("graft-sqivf-")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    SqAnn.buildSqIvfIndex(corpus, s"$base/index", nlist = 8)
    // full probe (nprobe = nlist) removes the cell-miss risk: the result
    // must reproduce brute force bit-for-bit (rerank is exact)
    val full = SqAnn.sqIvfQuery(queries, s"$base/index", k = 5, nprobe = 8)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(full == exact, "full-probe IVF-SQ8 must equal brute force")
    // wrong-dim probe refused against persisted geometry
    val bad = queries.withColumn("embedding",
      slice(col("embedding"), 1, 8))
    val e = intercept[IllegalArgumentException] {
      SqAnn.sqIvfQuery(bad, s"$base/index", k = 5)
    }
    assert(e.getMessage.contains("dim"), e.getMessage)
  }

  test("grid refuses ragged input; constant dims encode stably") {
    val grid = new Sq8Grid(Array(0.0, 0.0), Array(1e-12, 1.0 / 255))
    val df = Seq((1L, Seq(0.0, 0.5)), (2L, Seq(0.0, 1.0))).toDF("id", "e")
    val codes = df.orderBy("id")
      .select(SqFunctions.sq8Encode(col("e"), grid)).as[Array[Byte]].collect()
    assert((codes(0)(0) & 0xff) == 0 && (codes(1)(0) & 0xff) == 0) // constant dim
    assert((codes(0)(1) & 0xff) == 128 && (codes(1)(1) & 0xff) == 255)
    val ragged = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "e")
    val e = intercept[Exception] {
      ragged.select(SqFunctions.sq8Encode(col("e"), grid)).collect()
    }
    assert(e.getMessage != null)
  }

  test("fitGrid refuses NaN embeddings instead of fitting a NaN grid") {
    // Spark's max() ranks NaN above every double: without the guard one
    // NaN vector makes hi (hence scale and the closed-form band) NaN and
    // every SQ8 code in that dimension garbage — the fit must fail loudly
    val corpus = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)),
      (3L, Seq(Float.NaN, 1.0f))).toDF("id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SqAnn.fitGrid(corpus, "embedding")
    }
    assert(e.getMessage.contains("NaN"), e.getMessage)
  }
}
