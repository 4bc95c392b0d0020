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
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val toks = TextFunctions.tokens(col(textCol))
        val counters = batch.agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
          sum(length(col(textCol)).cast("long")).as("n_chars"))
        val sketch = batch.select(explode(toks).as("tok"))
          .agg(hll_sketch_agg(col("tok")).as("vocab_sketch"))
        counters.crossJoin(sketch)
          .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
        ()
      }
      .start()

  /** The corpus-wide stats: one row
    * (n_docs, n_tokens, n_chars, vocab_estimate) folded from all deltas.
    */
  def read(spark: SparkSession, statsDir: String): DataFrame =
    spark.read.parquet(statsDir).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      hll_sketch_estimate(hll_union_agg(col("vocab_sketch"))).as("vocab_estimate"))
}
