package graft

import org.apache.spark.sql.functions._
import graft.operators.{PqIndex, Similarity}

/** r10: persisted vector indexes carry their geometry and REFUSE a
  * mismatched probe. Without the check, a wrong-dim probe NULLs through
  * DotProduct (null on length mismatch), fails every comparison, and the
  * serve returns zero rows GREEN — the silent-miss class EmbeddingIndex /
  * CorpusIndex (r9) and PqIndex pre-band (r8) already refuse; these were
  * the two persisted indexes that predated the discipline.
  * Plus the sharded IVF build/serve: merged scatter-gather top-k must
  * reproduce the single-index (here: exact) answer.
  */
class IvfIndexSpec extends SparkSuite {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding"))
  private def corpus = emb.filter(col("vec_id") >= 5)
    .select(col("vec_id").as("id"), col("embedding"))
  /** Same query batch, embeddings truncated to 32 dims — the wrong-dim
    * probe a mixed-up caller would send at a 64-dim index.
    */
  private def badQueries = queries
    .select(col("qid"), slice(col("embedding"), 1, 32).as("embedding"))

  test("IVF index persists (dim, nlist, metric); wrong-dim probe is refused naming both dims") {
    val dir = s"${tmpDir("graft-ivfgeom-")}/index"
    Similarity.buildIvfIndex(corpus, dir, nlist = 4)
    assert(Similarity.readIvfGeometry(spark, dir).contains((64, 4, "cosine")))
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfIndexQuery(badQueries, dir, k = 3, nprobe = 2)
    }
    assert(ex.getMessage.contains("32") && ex.getMessage.contains("dim=64"),
      ex.getMessage)
    // a ragged batch (mixed dims) is also refused, naming the range
    val ragged = queries.select(col("qid"),
      when(col("qid") === 0, slice(col("embedding"), 1, 16))
        .otherwise(col("embedding")).as("embedding"))
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.ivfIndexQuery(ragged, dir, k = 3, nprobe = 2)
    }
    assert(ex2.getMessage.contains("16..64"), ex2.getMessage)
    // the matched probe serves k rows per query
    val ok = Similarity.ivfIndexQuery(queries, dir, k = 3, nprobe = 2)
    assert(ok.groupBy("qid").count().collect().forall(_.getLong(1) == 3))
  }

  test("pre-geometry IVF index: expectedDim restores the refusal; without it serve still works") {
    val dir = s"${tmpDir("graft-ivfpre-")}/index"
    Similarity.buildIvfIndex(corpus, dir, nlist = 4)
    val g = new org.apache.hadoop.fs.Path(s"$dir/_geometry")
    assert(g.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(g, true))
    // compatibility: no geometry + no expectedDim = serve with a warning
    val ok = Similarity.ivfIndexQuery(queries, dir, k = 3, nprobe = 2)
    assert(ok.count() == 15)
    // caller-supplied expectedDim restores the wrong-dim refusal
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfIndexQuery(badQueries, dir, k = 3, nprobe = 2, expectedDim = 64)
    }
    assert(ex.getMessage.contains("dim=64"), ex.getMessage)
    // and a geometry-carrying index cross-checks a contradicting expectedDim
    val dir2 = s"${tmpDir("graft-ivfpre2-")}/index"
    Similarity.buildIvfIndex(corpus, dir2, nlist = 4)
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.ivfIndexQuery(queries, dir2, k = 3, nprobe = 2, expectedDim = 32)
    }
    assert(ex2.getMessage.contains("wrong index"), ex2.getMessage)
  }

  test("IVF-PQ index persists dim in the codebooks row; wrong-dim probe is refused") {
    val dir = s"${tmpDir("graft-pqgeom-")}/index"
    PqIndex.buildPqIvfIndex(corpus, dir, dim = 64, nlist = 4, m = 8, ksub = 16)
    val meta = spark.read.parquet(s"$dir/codebooks").head()
    assert(meta.getAs[Int]("dim") == 64 && meta.getAs[Int]("nlist") == 4)
    val ex = intercept[IllegalArgumentException] {
      PqIndex.pqIvfQuery(badQueries, dir, k = 3, nprobe = 2)
    }
    assert(ex.getMessage.contains("dim=64"), ex.getMessage)
    val ok = PqIndex.pqIvfQuery(queries, dir, k = 3, nprobe = 2)
    assert(ok.groupBy("qid").count().collect().forall(_.getLong(1) == 3))
  }

  test("sharded IVF: full-probe scatter-gather merge equals the exact top-k") {
    val base = tmpDir("graft-ivfshard-")
    Similarity.buildIvfIndexSharded(corpus, s"$base/index", nShards = 2, nlist = 4)
    assert(Similarity.readSharding(spark, s"$base/index").contains(2))
    // every shard carries its own geometry (each built via buildIvfIndex)
    assert(Similarity.readIvfGeometry(spark, s"$base/index/shard=0")
      .contains((64, 4, "cosine")))
    // nprobe = nlist scans every cell of every shard: the merge must then
    // reproduce the EXACT answer (each corpus row lives in exactly one
    // shard, so the union of full per-shard top-ks contains the global
    // top-k; the final window keeps exactly it)
    val got = Similarity.ivfIndexQuerySharded(queries, s"$base/index", k = 5, nprobe = 4)
      .select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      .select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact, s"merged=${got.size} exact=${exact.size} diff=${got.diff(exact)}")
    // wrong-dim probes are refused per shard (geometry travels with each)
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfIndexQuerySharded(badQueries, s"$base/index", k = 5, nprobe = 4)
    }
    assert(ex.getMessage.contains("dim=64"), ex.getMessage)
    // a non-sharded dir is refused (never silently served as shard 0)
    val single = s"$base/single"
    Similarity.buildIvfIndex(corpus, single, nlist = 4)
    val ex2 = intercept[IllegalStateException] {
      Similarity.ivfIndexQuerySharded(queries, single, k = 5)
    }
    assert(ex2.getMessage.contains("_sharding"), ex2.getMessage)
  }

  test("empty probe batch serves empty; NULL-embedding probes are refused; empty shard build fails fast") {
    val dir = s"${tmpDir("graft-ivfedge-")}/index"
    Similarity.buildIvfIndex(corpus, dir, nlist = 4)
    // an empty batch is a legal serve (the pre-r10 behavior): no NPE,
    // empty result
    val none = queries.where(col("qid") < 0)
    assert(Similarity.ivfIndexQuery(none, dir, k = 3, nprobe = 2).count() == 0)
    // NULL embeddings NULL through the similarity expressions exactly like
    // a wrong dim — refused by the same rule
    val withNull = queries.select(col("qid"),
      when(col("qid") === 0, lit(null)).otherwise(col("embedding")).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfIndexQuery(withNull, dir, k = 3, nprobe = 2)
    }
    assert(ex.getMessage.contains("NULL embedding"), ex.getMessage)
    // a shard count the corpus can't fill is refused BEFORE any shard is
    // written (an empty shard would strand a half-built index)
    val tiny = corpus.limit(3)
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.buildIvfIndexSharded(tiny, s"${tmpDir("graft-ivfempty-")}/idx",
        nShards = 64, nlist = 0)
    }
    assert(ex2.getMessage.contains("EMPTY"), ex2.getMessage)
  }

  test("sharded IVF-PQ: scatter-gather merge matches exact top-k at full probe width") {
    val base = tmpDir("graft-pqshard-")
    PqIndex.buildPqIvfIndexSharded(corpus, s"$base/index", nShards = 2,
      dim = 64, nlist = 4, m = 8, ksub = 16)
    // full probe width + generous band-adaptive rerank: the candidate set
    // per shard covers the true neighbors, and the EXACT rerank makes the
    // merged global window reproduce brute force
    val got = PqIndex.pqIvfQuerySharded(queries, s"$base/index", k = 5,
        nprobe = 4, refine = 32)
      .select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      .select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact, s"diff=${got.diff(exact)} / ${exact.diff(got)}")
    // wrong-dim probe refused per shard; non-sharded dir refused
    val ex = intercept[IllegalArgumentException] {
      PqIndex.pqIvfQuerySharded(badQueries, s"$base/index", k = 5)
    }
    assert(ex.getMessage.contains("dim=64"), ex.getMessage)
    val singlePq = s"$base/single"
    PqIndex.buildPqIvfIndex(corpus, singlePq, dim = 64, nlist = 4, m = 8, ksub = 16)
    val ex2 = intercept[IllegalStateException] {
      PqIndex.pqIvfQuerySharded(queries, singlePq, k = 5)
    }
    assert(ex2.getMessage.contains("_sharding"), ex2.getMessage)
  }
}
