package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, Dedup, Sampling}

/** Pins the README "Quickstart: building a training corpus" snippet: the
  * code published as the public API example must keep compiling and
  * producing a train manifest. Mirrors the snippet statement for
  * statement (reads swapped for the test tables).
  */
class ReadmeSnippetSpec extends SparkSuite {

  test("the README q99 quickstart snippet compiles and runs end to end") {
    val docs = graft.queries.Registry.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    // 1. clean (the README uses the at-scale production profile)
    val ann   = CorpusPipeline.annotate(docs, CorpusPipeline.Config.production())
    val clean = ann.where(col("reject_reason").isNull)
      .select(col("doc_id"), col("text"), col("n_tokens"))

    // 2. decontaminate
    val bench        = docs.limit(2)
    val contaminated = Dedup.contamination(clean, "doc_id", "text",
        bench, "doc_id", "text", n = 8)
      .select(col("train_id").as("doc_id")).distinct()
    val decon = clean.join(contaminated, Seq("doc_id"), "left_anti")

    // 3. deterministic 80% sample
    val sampled = Sampling.deterministicSample(decon, "doc_id", 0.8)
      .withColumn("stratum", lit("all"))

    // 4. pack to a token budget
    val packed = Sampling.packByBudget(sampled, "doc_id", "n_tokens", "stratum",
      budget = 4_000_000_000L)

    // 5. epoch-0 training order
    val train = Sampling.epochShuffle(
      packed.select(col("doc_id"), col("n_tokens"), col("cum_weight")),
      "doc_id", epoch = 0)

    val out = tmpDir("graft-readme-") + "/train-manifest"
    train.write.parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() > 0)
    assert(Seq("shuffle_key", "doc_id", "n_tokens", "cum_weight")
      .forall(back.schema.fieldNames.contains))
  }

  test("the README similarity-serving quickstart snippet compiles and runs end to end") {
    import graft.operators.{PqIndex, Similarity}
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.where(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding"))
    val base = tmpDir("graft-readme-ann-")

    // single index, auto-sized cells
    Similarity.buildIvfIndex(corpus, s"$base/v1", nlist = 0)
    val top10 = Similarity.ivfIndexQuery(queries, s"$base/v1", k = 10, nprobe = 4)
    assert(top10.groupBy("qid").count().collect().forall(_.getLong(1) == 10))

    // sharded (README uses 64 shards at scale; 2 exercises the same path)
    Similarity.buildIvfIndexSharded(corpus, s"$base/v2", nShards = 2, nlist = 0)
    val top10b = Similarity.ivfIndexQuerySharded(queries, s"$base/v2",
      k = 10, nprobe = 4)
    assert(top10b.groupBy("qid").count().collect().forall(_.getLong(1) == 10))

    // PQ memory-bound tier, sharded (test embeddings are 64-dim)
    PqIndex.buildPqIvfIndexSharded(corpus, s"$base/v3", nShards = 2,
      dim = 64, nlist = 4, ksub = 16)
    val top10c = PqIndex.pqIvfQuerySharded(queries, s"$base/v3", k = 10)
    assert(top10c.groupBy("qid").count().collect().forall(_.getLong(1) == 10))

    // streaming index with the geometry handshake
    graft.streaming.EmbeddingIndex.seed(corpus.limit(100)
        .select(col("id").as("vec_id"), col("embedding")),
      "vec_id", "embedding", dim = 64, s"$base/stream", bitsPerTable = 0)
    val (t, b, dm) = graft.streaming.EmbeddingIndex
      .readGeometry(spark, s"$base/stream").get
    queries.select(col("qid").as("vec_id"), col("embedding"))
      .write.parquet(s"$base/src")
    val newVectors = spark.readStream
      .schema("vec_id long, embedding array<float>").parquet(s"$base/src")
    graft.streaming.EmbeddingIndex.start(newVectors, "vec_id", "embedding", dm,
      s"$base/stream", s"$base/pairs", s"$base/ck",
      nTables = t, bitsPerTable = b).awaitTermination()
    assert(new java.io.File(s"$base/pairs").exists())
  }
}
