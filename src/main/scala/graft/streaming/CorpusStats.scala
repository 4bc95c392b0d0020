package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TextFunctions

/** Incrementally-maintained corpus statistics: each micro-batch appends ONE
  * tiny delta row — exact counters (docs, tokens, chars) plus a MERGEABLE
  * DataSketches HLL sketch of its distinct tokens — and the corpus-wide
  * stats are an O(batches) fold over deltas: counters sum, sketches
  * `hll_union_agg`. Nothing ever rescans the corpus, which is the only
  * workable shape for "how many distinct tokens does the 100 TB corpus
  * have" maintained continuously (an exact distinct would shuffle the
  * whole vocabulary every batch).
  *
  * Deltas are idempotent per batch (overwrite-by-batchId, same replay
  * contract as [[CorpusIndex]]).
  */
object CorpusStats {

  def start(docs: DataFrame, idCol: String, textCol: String,
      statsDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val batch = b.persist() // two aggregations consume the same batch
        try {
        val toks = TextFunctions.tokens(col(textCol))
        val counters = batch.agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
          sum(length(col(textCol)).cast("long")).as("n_chars"),
          // mergeable KLL quantile sketch of the batch's quality scores —
          // corpus-wide quality percentiles (the drift monitor every
          // continuous ingest wants) fold from deltas like the counters do
          kll_sketch_agg_double(TextFunctions.qualityScore(col(textCol)))
            .as("quality_sketch"))
        val sketch = batch.select(explode(toks).as("tok"))
          .agg(hll_sketch_agg(col("tok")).as("vocab_sketch"))
        counters.crossJoin(sketch)
          .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
        } finally { batch.unpersist(); () }
      }
      .start()

  /** The corpus-wide stats: one row (n_docs, n_tokens, n_chars,
    * vocab_estimate, quality_p50, quality_p90) folded from all deltas.
    */
  def read(spark: SparkSession, statsDir: String): DataFrame =
    spark.read.parquet(statsDir).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      hll_sketch_estimate(hll_union_agg(col("vocab_sketch"))).as("vocab_estimate"),
      kll_merge_agg_double(col("quality_sketch")).as("quality_merged"))
    .select(col("n_docs"), col("n_tokens"), col("n_chars"), col("vocab_estimate"),
      kll_sketch_get_quantile_double(col("quality_merged"), lit(0.5)).as("quality_p50"),
      kll_sketch_get_quantile_double(col("quality_merged"), lit(0.9)).as("quality_p90"))
}
