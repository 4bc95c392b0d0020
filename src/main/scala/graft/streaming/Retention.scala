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
    *
    * The cutoff's WALL-CLOCK FIELDS are matched against the partition
    * values — the same session-timezone-relative terms the delivery
    * derived year/month/day/hour from — so the comparison is independent
    * of the JVM default timezone (`cutoff.getTime`, an epoch instant,
    * would shift by the JVM offset and silently expire the wrong hours on
    * a non-UTC driver).
    */
  def sweep(spark: SparkSession, lakeDir: String, cutoff: java.sql.Timestamp,
      manifestDir: Option[String] = None): Compact.Stats = {
    val cutLocal = cutoff.toLocalDateTime
    require(cutLocal.getMinute == 0 && cutLocal.getSecond == 0 && cutLocal.getNano == 0,
      s"cutoff $cutoff must align to the hour-partition granularity")
    val hconf = spark.sessionState.newHadoopConf()
    val lake = new HPath(lakeDir)
    val fs = lake.getFileSystem(hconf)
    if (!fs.exists(lake)) return Compact.Stats(0, 0, 0)
    Compact.recover(spark, lakeDir, manifestDir)

    // partition dir → the [start, start+1h) wall-clock range it covers,
    // compared field-wise against the cutoff's wall clock (no epoch
    // conversion anywhere — timezone cannot leak in)
    def partStart(dir: HPath): Option[java.time.LocalDateTime] = {
      val segs = dir.toString.split('/').filter(_.contains("="))
        .map { s => val Array(k, v) = s.split("=", 2); k -> v }.toMap
      for {
        y <- segs.get("year"); m <- segs.get("month")
        d <- segs.get("day"); h <- segs.get("hour")
      } yield java.time.LocalDateTime.of(y.toInt, m.toInt, d.toInt, h.toInt, 0)
    }
    val expired = FsOps.walkParquet(fs, lake, skipHidden = true).groupBy(_.getParent).filter { case (dir, _) =>
      partStart(dir).exists(start => !start.plusHours(1).isAfter(cutLocal))
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
