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
}
