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

  /** Timestamp convenience overload: the cutoff's WALL-CLOCK FIELDS (what
    * `Timestamp.valueOf("2024-01-15 00:00:00")` reads back) are the
    * cutoff — NOT its epoch instant. A Timestamp built from an epoch
    * (`new Timestamp(now - retentionMs)`) carries JVM-default-zone fields;
    * when partitions were derived under a different session timezone,
    * convert explicitly and call the [[java.time.LocalDateTime]] form.
    */
  def sweep(spark: SparkSession, lakeDir: String, cutoff: java.sql.Timestamp,
      manifestDir: Option[String]): Compact.Stats =
    sweep(spark, lakeDir, cutoff.toLocalDateTime, manifestDir)

  def sweep(spark: SparkSession, lakeDir: String, cutoff: java.sql.Timestamp): Compact.Stats =
    sweep(spark, lakeDir, cutoff.toLocalDateTime, None)

  /** Drop every `year=/month=/day=/hour=` partition strictly older than
    * `cutoff` (exclusive; rows with ts ≥ cutoff are untouched). Returns
    * (partitions dropped, files retired, 0).
    *
    * The cutoff is a timezone-free WALL CLOCK compared field-wise against
    * the partition values — interpret it in whatever frame the delivery's
    * session timezone derived year/month/day/hour in (UTC for every
    * session this library builds). No epoch conversion happens anywhere,
    * so the JVM default timezone cannot shift the horizon.
    */
  def sweep(spark: SparkSession, lakeDir: String, cutoff: java.time.LocalDateTime,
      manifestDir: Option[String] = None,
      lock: LockProvider = FsLeaseLock): Compact.Stats = {
    val cutLocal = cutoff
    require(cutLocal.getMinute == 0 && cutLocal.getSecond == 0 && cutLocal.getNano == 0,
      s"cutoff $cutoff must align to the hour-partition granularity")
    val hconf = spark.sessionState.newHadoopConf()
    val lake = new HPath(lakeDir)
    val fs = lake.getFileSystem(hconf)
    if (!fs.exists(lake)) return Compact.Stats(0, 0, 0)
    Compact.withWriterLock(fs, lake, lock = lock) {
    Compact.recoverUnlocked(spark, lakeDir, manifestDir)

    // partition dir → the [start, start+1h) wall-clock range it covers,
    // compared field-wise against the cutoff's wall clock (no epoch
    // conversion anywhere — timezone cannot leak in). Only segments BELOW
    // the lake root count: an ancestor directory named like `hour=0`
    // sitting above lakeDir must not masquerade as a partition value.
    val lakePrefix = fs.makeQualified(lake).toString.stripSuffix("/") + "/"
    def partStart(dir: HPath): Option[java.time.LocalDateTime] = {
      val rel = fs.makeQualified(dir).toString.stripPrefix(lakePrefix)
      val segs = rel.split('/').filter(_.contains("="))
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
    } // withWriterLock
  }
}
