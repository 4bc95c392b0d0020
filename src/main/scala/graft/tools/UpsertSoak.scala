package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.UpsertSink

/** Scale-gate tool for the CDC STAGED-MERGE UPSERT (K8): measure that a
  * micro-batch's merge cost tracks the TOUCHED buckets' bytes, not the
  * table's. The sink hash-buckets the table by key; a batch reads, merges
  * and rewrites only the buckets its keys land in (UpsertSink scale
  * design). Two same-size update batches at each table size make the
  * claim measurable:
  *
  *   - HOT: 20k update keys confined to a few buckets (a CDC working
  *     set — most real change streams concentrate; the bucket count is
  *     sized per phase so the batch actually reaches 20k keys) → should
  *     cost a small fraction of...
  *   - SPREAD: 20k update keys uniform over all 256 buckets (worst case:
  *     every bucket touched) → the upper bound at that table size.
  *
  * Between measurements the table grows by 400k fresh keys per phase, so
  * the curve also shows the growth law: HOT cost grows with the touched
  * buckets' fill, never with the table — at production
  * scale nBuckets is provisioned for the target table size precisely so
  * touched-bucket bytes stay bounded (the knob the first commit pins).
  *
  * Usage: runMain graft.tools.UpsertSoak [phases] [growSize] [hotSize] [nBuckets]
  */
object UpsertSoak {
  def main(args: Array[String]): Unit = {
    val phases = if (args.nonEmpty) args(0).toInt else 5
    val growSize = if (args.length > 1) args(1).toLong else 400000L
    val hotSize = if (args.length > 2) args(2).toInt else 20000
    val nBuckets = if (args.length > 3) args(3).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("graft-upsoak-").toString
    val table = s"$base/table"
    var batchId = 0L
    def apply(changes: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      UpsertSink.applyBatch(changes, batchId, table, "id", "op", Seq("seq"),
        nBuckets = nBuckets)
      batchId += 1
      (System.nanoTime() - t0) / 1e9
    }
    // payload sized so bucket bytes are non-trivial (~100 B/row)
    def rowsOf(ids: org.apache.spark.sql.DataFrame) = ids
      .withColumn("payload", concat(lit("v"), col("id"), lit("-"),
        lpad(lit("x"), 90, "x")))
      .withColumn("op", lit("U"))
      .withColumn("seq", lit(batchId))

    val results = (0 until phases).map { g =>
      val growSec = apply(rowsOf(
        spark.range(g * growSize, (g + 1) * growSize).select(col("id"))))
      val tableRows = (g + 1) * growSize
      // spread: every nBuckets-th key over the live range → touches all buckets
      val spreadSec = apply(rowsOf(
        spark.range(0, tableRows).select(col("id"))
          .where(pmod(col("id"), lit(tableRows / hotSize)) === 0).limit(hotSize)))
      // hot: keys whose bucket hash lands in [0, hotBuckets). The bucket
      // count is sized PER PHASE so the batch actually reaches hotSize —
      // a fixed 8/256 at a 400k-row table yields only ~12.5k candidate
      // keys (400k·8/256), silently shrinking the first "hot" batch and
      // flattering the hot/spread ratio (round-8 advice). 1.5× headroom
      // over the expectation covers hash non-uniformity; the floor of 8
      // keeps the working set bucket-concentrated once the table is big.
      val hotBuckets = math.min(nBuckets.toLong, math.max(8L,
        math.ceil(1.5 * hotSize * nBuckets / tableRows).toLong)).toInt
      val hotIds = spark.range(0, tableRows).select(col("id"))
        .where(pmod(hash(col("id")), lit(nBuckets)) < hotBuckets).limit(hotSize)
      val hotN = hotIds.count()
      val hotSec = apply(rowsOf(hotIds))
      if (hotN < hotSize)
        println(s"WARNING phase $g: hot batch only $hotN of $hotSize keys " +
          s"($hotBuckets of $nBuckets buckets) — hot/spread not size-matched")
      println(f"PHASE $g  table=${tableRows}%8d rows  grow=${growSec}%6.1f s  " +
        f"spread${hotSize / 1000}k=${spreadSec}%6.1f s ($nBuckets buckets)  " +
        f"hot=${hotSec}%6.1f s ($hotN keys in $hotBuckets buckets)")
      (tableRows, growSec, spreadSec, hotSec, hotBuckets, hotN)
    }
    val json = results.map { case (n, gs, ss, hs, hb, hn) =>
      f"""{"table_rows":$n,"grow_s":$gs%.2f,"spread_s":$ss%.2f,""" +
        f""""hot_s":$hs%.2f,"hot_buckets":$hb,"hot_keys":$hn}"""
    }.mkString("[", ",", "]")
    println(s"""{"n_buckets":$nBuckets,"hot_size":$hotSize,"phases":$json}""")
    spark.stop()
  }
}
