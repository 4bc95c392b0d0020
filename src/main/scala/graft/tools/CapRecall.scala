package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.Registry

/** Scale-gate tool (VERDICT r7 ask #2): measure what q108's production
  * caps actually DROP relative to q47's exact mode at a scaled instance —
  * the caps' cost was measured in round 7 (bucket floods: 39× shuffle per
  * data decade, 20 GB spill uncapped at 100×), but their recall retention
  * was argued (`Dedup.lshCandidates`: flooded docs keep k-band chances in
  * their smaller buckets; true near-dups share most bands), not measured.
  *
  * Runs the shared survivor/shingle stage once, then the candidate+verify
  * stage twice on the SAME checkpointed arrays — exact (no cap, string
  * verify) vs production (maxBucketSize=64, fingerprint verify, q108's
  * settings) — and reports pair-level and doc-level recall of the capped
  * mode against the exact truth set, plus per-mode shuffle bytes from the
  * task-metrics listener.
  *
  * Usage: runMain graft.tools.CapRecall <sfDir> [maxBucketSize]
  */
object CapRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val cap = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val accWrite = new java.util.concurrent.atomic.AtomicLong
    val accSpill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          accWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          accSpill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          ()
        }
      }
    })
    def snap(): (Long, Long) = {
      org.apache.spark.graftbridge.ListenerBridge.flushListeners(spark.sparkContext)
      (accWrite.get, accSpill.get)
    }

    // q47/q108's shared upstream: the planted corpus, quality/exact-dup
    // gates skipped — the caps only touch the NEAR-dup stage, so measure
    // exactly that stage over the full document set.
    val docs = Registry.tbl(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    val arrays = Dedup.shingleArrays(docs, "doc_id", "text", n = 3).localCheckpoint()
    val bands = Dedup.minhashBandsNarrow(arrays, k = 16, rowsPerBand = 2).localCheckpoint()
    val nDocs = arrays.count()

    def verified(maxBucket: Option[Int], fingerprint: Boolean): DataFrame = {
      val cand = Dedup.lshCandidates(bands, maxBucket)
      val va = if (fingerprint)
        arrays.select(col("id"), transform(col("sh"), x => xxhash64(x)).as("sh"))
      else arrays
      Dedup.jaccardOnArrays(cand, va)
        .where(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
    }

    def timedMode(name: String, maxBucket: Option[Int], fingerprint: Boolean): (DataFrame, Long, Long, Double) = {
      val (w0, s0) = snap()
      val t0 = System.nanoTime()
      val pairs = verified(maxBucket, fingerprint).localCheckpoint()
      val n = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val (w1, s1) = snap()
      println(f"MODE $name%-12s pairs=$n%8d  shuffleWrite=${(w1 - w0) / 1048576.0}%9.1f MB  spill=${(s1 - s0) / 1048576.0}%9.1f MB  ${sec}%7.1f s")
      (pairs, w1 - w0, s1 - s0, sec)
    }

    val (exact, wExact, spExact, _) = timedMode("exact", None, fingerprint = false)
    val (capped, wCap, spCap, _) = timedMode("capped", Some(cap), fingerprint = true)

    val nExact = exact.count()
    val hit = capped.join(exact, Seq("id_a", "id_b"), "left_semi").count()
    val extra = capped.join(exact, Seq("id_a", "id_b"), "left_anti").count()
    // doc-level: what the pipeline consumes (the dropped side of each pair)
    val exactDocs = exact.select(col("id_b")).distinct()
    val capDocs = capped.select(col("id_b")).distinct()
    val nExactDocs = exactDocs.count()
    val docHit = capDocs.join(exactDocs, Seq("id_b"), "left_semi").count()

    val pairRecall = if (nExact == 0) 1.0 else hit.toDouble / nExact
    val docRecall = if (nExactDocs == 0) 1.0 else docHit.toDouble / nExactDocs
    println(s"""{"sf":"$sfDir","n_docs":$nDocs,"cap":$cap,""" +
      s""""pairs_exact":$nExact,"pairs_capped_hit":$hit,"pairs_capped_extra":$extra,""" +
      s""""pair_recall":$pairRecall,"docs_exact":$nExactDocs,"doc_recall":$docRecall,""" +
      s""""shuffle_exact_mb":${wExact / 1048576},"shuffle_capped_mb":${wCap / 1048576},""" +
      s""""spill_exact_mb":${spExact / 1048576},"spill_capped_mb":${spCap / 1048576}}""")
    spark.stop()
  }
}
