package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.ShardedLog
import graft.sources.v2.GraftLog
import graft.streaming.Erase

/** Scale-gate tool: measure (a) GDPR erasure from the RETAINED graftlog —
  * wall for the one-pass scan+rewrite, fraction of segments actually
  * rewritten (the claim: writes ∝ affected segments, reads one pass), and
  * the certificate's raw line scan; (b) the parquet-lake certificate cost
  * (`Erase.verify` = one column-pruned broadcast-semi-join scan per
  * component) on the largest scaled table.
  *
  * Usage: runMain graft.tools.LogEraseScale <sfDir> [nSubjects]
  */
object LogEraseScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val nSubjects = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // Registry.tbl normalizes the NTZ timestamp column (the documented trap)
    val events = graft.queries.Registry.tbl(spark, sfDir, "events")
    val total = events.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-logerase-")
      .toString + "/log"
    val (_, buildWall) = timed(
      GraftLog.append(ShardedLog.fromEvents(events, nShards = 32), dir))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val segsBefore = GraftLog.listSegments(fs, dir).values.flatten.size

    // a typical GDPR request batch: a handful of subjects, hash-drawn
    val subjects = events.select(col("user_id")).distinct()
      .orderBy(xxhash64(col("user_id"))).limit(nSubjects)
      .select(concat(lit("events-"), col("user_id")).as("partition_key"))
    val keySet = subjects.as[String].collect().toSet
    val subjectRows = events
      .where(concat(lit("events-"), col("user_id")).isin(keySet.toSeq: _*))
      .count()

    val (stats, eraseWall) = timed(GraftLog.eraseKeys(spark, dir, subjects))
    require(stats.linesErased == subjectRows,
      s"erase removed ${stats.linesErased} lines, expected $subjectRows")
    val (certHits, certWall) = timed(GraftLog.countKeyLines(spark, dir, keySet))
    require(certHits == 0L, s"certificate found $certHits residual lines")
    val (replayed, replayWall) = timed(
      spark.read.format("graftlog").load(dir).count())
    require(replayed == total - subjectRows,
      s"replay returned $replayed rows, expected ${total - subjectRows}")

    // parquet-lake certificate cost: one key-column scan of the largest
    // scaled table (keys absent — pure scan cost, clean result)
    val (lakeCert, lakeCertWall) = timed(Erase.verify(spark,
      Seq(-1L, -2L, -3L, -4L, -5L).toDF("l_orderkey"),
      lakes = Seq(Erase.LakeTarget(s"$sfDir/lineitem.parquet", "l_orderkey"))))
    require(lakeCert.clean)

    println(s"""{"tool":"LogEraseScale","sf":"$sfDir","rows":$total""" +
      s""","segments":$segsBefore,"subjects":$nSubjects""" +
      s""","subject_rows":$subjectRows""" +
      s""","segments_rewritten":${stats.segmentsRewritten}""" +
      f""","frac_rewritten":${stats.segmentsRewritten.toDouble / segsBefore}%.4f""" +
      f""","build_s":$buildWall%.2f,"erase_s":$eraseWall%.2f""" +
      f""","log_cert_s":$certWall%.2f,"replay_s":$replayWall%.2f""" +
      f""","lake_cert_s":$lakeCertWall%.2f}""")
    spark.stop()
  }
}
