package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Retention enforcement over the hour-partitioned lake — the expiry the
  * reference configures on the stream (24 h – 365 days, README.md:60,
  * 81-83) applied to the delivered data: partitions wholly older than the
  * cutoff are dropped, WHOLE-DIRECTORY at a time (no row scan, no file
  * open — partition values alone decide), through the same write-ahead
  * intent + commit-marker + manifest-fold protocol as [[Compact]], so a
  * crash mid-sweep never leaves a half-dropped partition invisible to
  * recovery, and manifest readers flip atomically.
  *
  * Scale shape: O(partition dirs) listing, zero data reads, executor-free
  * (pure metadata). The cutoff must align to the partition granularity
  * (whole hours) — a partition is dropped only when its entire [h, h+1)
  * range is past the cutoff, so no surviving row is ever inside a dropped
  * dir.
  */
object Retention {

  /** Drop every `year=/month=/day=/hour=` partition strictly older than
    * `cutoff` (exclusive; rows with ts ≥ cutoff are untouched). Returns
    * (partitions dropped, files retired, 0).
    */
  def sweep(spark: SparkSession, lakeDir: String, cutoff: java.sql.Timestamp,
      manifestDir: Option[String] = None): Compact.Stats = {
    require(cutoff.getTime % 3600000L == 0,
      s"cutoff $cutoff must align to the hour-partition granularity")
    val hconf = spark.sessionState.newHadoopConf()
    val lake = new HPath(lakeDir)
    val fs = lake.getFileSystem(hconf)
    if (!fs.exists(lake)) return Compact.Stats(0, 0, 0)
    Compact.recover(spark, lakeDir, manifestDir)

    // partition dir → the [start, start+1h) range it covers, in the same
    // UTC terms the delivery derived the partition values from
    def partStart(dir: HPath): Option[java.time.Instant] = {
      val segs = dir.toString.split('/').filter(_.contains("="))
        .map { s => val Array(k, v) = s.split("=", 2); k -> v }.toMap
      for {
        y <- segs.get("year"); m <- segs.get("month")
        d <- segs.get("day"); h <- segs.get("hour")
      } yield java.time.LocalDateTime
        .of(y.toInt, m.toInt, d.toInt, h.toInt, 0)
        .toInstant(java.time.ZoneOffset.UTC)
    }
    def walk(dir: HPath): Seq[HPath] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else if (n.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
    val cut = cutoff.toInstant
    val expired = walk(lake).groupBy(_.getParent).filter { case (dir, _) =>
      partStart(dir).exists(start => start.plusSeconds(3600).compareTo(cut) <= 0)
    }
    if (expired.isEmpty) return Compact.Stats(0, 0, 0)

    val olds = expired.values.flatten.map(fs.makeQualified(_).toString).toSeq.sorted
    FsOps.atomicWrite(hconf, fs, Compact.ctl(lake, "intent"),
      (manifestDir.map("M " + _).toSeq ++ olds.map("O " + _))
        .mkString("\n").getBytes("UTF-8"))
    fs.create(Compact.ctl(lake, "promoted"), true).close()
    Compact.finish(spark, fs, lake, olds, Seq.empty, manifestDir)
    // prune now-empty partition dir chains (never the lake root itself) so
    // directory listings stay clean
    val rootQ = fs.makeQualified(lake)
    expired.keys.foreach { dir =>
      var d = dir
      while (d != null && fs.makeQualified(d) != rootQ &&
          fs.exists(d) && fs.listStatus(d).isEmpty) {
        FsOps.deleteOrThrow(fs, d, recursive = false)
        d = d.getParent
      }
    }
    Compact.Stats(expired.size, olds.size, 0)
  }
}
