package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming corpus-index dedup: the continuously-fed-corpus form of
  * [[graft.operators.Dedup.incrementalExact]]. Each incoming micro-batch of
  * documents is classified against an ACCUMULATING fingerprint index —
  * `known_dup` (fingerprint already in the corpus or any earlier batch),
  * `batch_dup` (a smaller doc_id in the same batch has the fingerprint),
  * `new` — then the batch's previously-unseen fingerprints are appended to
  * the index, so later batches dedup against everything that came before.
  * Re-deduplicating a 100 TB lake per incoming batch is not an option; this
  * keeps per-batch cost O(batch + index probe).
  *
  * Exactly-once without a transactional store: every batch writes its
  * verdicts to `verdicts/batch=<id>/` and its index delta to
  * `index/delta=<id>/`, each with OVERWRITE semantics — a crash-replayed
  * batch (foreachBatch is at-least-once) rewrites the SAME directories with
  * the SAME deterministic content instead of double-appending. The index
  * read is a plain partitioned-parquet scan of all deltas; the delta for
  * the replayed batch is excluded from its own probe (a half-written delta
  * from the crashed attempt must not make the batch classify itself as
  * already-known).
  *
  * Scale shape: the index carries fingerprints ONLY (16 bytes/doc — a
  * 100 TB corpus's index is a few hundred GB of parquet, itself
  * partition-pruned by delta). The probe join shuffles fingerprints, never
  * documents, and a small batch broadcasts against the index side.
  */
object CorpusIndex {

  val IndexSchema: StructType = StructType(Seq(StructField("fp", StringType)))

  /** Seed the index from an existing corpus (delta = -1, before any batch). */
  def seed(docs: DataFrame, idCol: String, textCol: String, indexDir: String): Unit =
    docs.select(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .distinct()
      .write.mode("overwrite").parquet(s"$indexDir/delta=-1")

  /** All index fingerprints from deltas EXCLUDING `excludeDelta` (a batch
    * must not probe its own possibly-half-written delta on replay).
    * Missing/empty index reads as empty.
    */
  def readIndex(spark: SparkSession, indexDir: String, excludeDelta: Long): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(indexDir)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], IndexSchema)
    spark.read.schema(StructType(IndexSchema.fields :+
        StructField("delta", LongType))).parquet(indexDir)
      .where(col("delta") =!= excludeDelta)
      .select(col("fp"))
  }

  /** Start the streaming dedup. `docs` is a streaming DataFrame with
    * (idCol: long, textCol: string). Verdicts land in
    * `verdictDir/batch=<id>/` as (doc_id, fp, verdict).
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, verdictDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val corpusFps = readIndex(spark, indexDir, excludeDelta = batchId)
        val verdicts = Dedup.incrementalExact(batch, idCol, textCol, corpusFps)
          .withColumnRenamed("id", idCol)
        verdicts.write.mode("overwrite").parquet(s"$verdictDir/batch=$batchId")
        // append the batch's previously-unseen fingerprints: 'new' docs and
        // the KEEPER of each batch_dup group (smallest id) — i.e. one row
        // per distinct fingerprint not already in the index
        spark.read.parquet(s"$verdictDir/batch=$batchId")
          .where(col("verdict") =!= "known_dup")
          .select(col("fp")).distinct()
          .write.mode("overwrite").parquet(s"$indexDir/delta=$batchId")
        ()
      }
      .start()
}
