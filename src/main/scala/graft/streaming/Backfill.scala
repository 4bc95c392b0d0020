package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.DataFrame

/** Partition backfill / repair — the lake maintenance op behind every
  * "re-run a bad hour" runbook step: late or corrected source data is
  * recomputed for a bounded set of partitions and swapped in atomically,
  * leaving every other partition byte-untouched (README.md:305-309's
  * resume-after-checkpoint model means the ORIGINAL delivery never
  * revisits an hour; repair is an out-of-band overwrite).
  *
  * This is dynamic-partition-overwrite semantics (only the partitions
  * present in `repaired` are replaced), but run through the SAME
  * crash-recoverable two-phase protocol as [[Compact]] — stage under
  * `_compact/stage`, write-ahead intent, promote, commit marker, retire,
  * manifest fold — so a crash at any step leaves the lake readable and
  * [[Compact.recover]] (shared control files) rolls it back or forward.
  * A plain `INSERT OVERWRITE` has no intent log: a mid-write crash leaves
  * the partition half-replaced with no record of what to restore.
  *
  * Idempotent by construction: re-running the same repair converges to the
  * same partition contents (the second pass overwrites its own output).
  *
  * Scale shape: the driver handles file NAMES only (O(files-in-touched-
  * partitions)); the data write is executor-parallel and never shuffles
  * beyond what `repaired`'s own plan needs. Untouched partitions are not
  * listed, opened, or renamed.
  */
object Backfill {

  /** Replace exactly the partitions present in `repaired` under `lakeDir`.
    *
    * @param repaired      corrected rows, carrying `partitionCols`; its
    *                      distinct partition values define the repair set
    * @param partitionCols hive-layout partition columns, outermost first
    *                      (must match the lake's existing layout)
    * @param manifestDir   manifest chain to fold (olds out, news in) at
    *                      the commit point, as [[Compact]] does
    * @return (partitions replaced, files retired, files written)
    */
  def overwritePartitions(repaired: DataFrame, lakeDir: String,
      partitionCols: Seq[String], manifestDir: Option[String] = None,
      crashBeforePromote: Boolean = false,
      lock: LockProvider = FsLeaseLock): Compact.Stats = {
    require(partitionCols.nonEmpty, "backfill needs at least one partition column")
    val spark = repaired.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val lake = new HPath(lakeDir)
    val fs = lake.getFileSystem(hconf)
    fs.mkdirs(lake)
    Compact.withWriterLock(fs, lake, lock = lock) {
    Compact.recoverUnlocked(spark, lakeDir, manifestDir)

    // 1. stage the repaired partitions (underscore dir ⇒ invisible)
    val stage = fs.makeQualified(Compact.ctl(lake, "stage"))
    repaired.write.mode("overwrite").option("compression", "snappy")
      .partitionBy(partitionCols: _*).parquet(stage.toString)

    // 2. the repair set = the stage's partition paths (k1=v1/k2=v2/…)
    val staged = FsOps.walkParquet(fs, stage, skipHidden = true)
    val stagePrefix = stage.toString + "/"
    val byPartition = staged.groupBy { f =>
      val rel = fs.makeQualified(f).toString.stripPrefix(stagePrefix)
      rel.split('/').dropRight(1).mkString("/")
    }
    if (byPartition.isEmpty || byPartition.keys.exists(_.isEmpty)) {
      FsOps.deleteOrThrow(fs, stage, recursive = true)
      if (byPartition.isEmpty) Compact.Stats(0, 0, 0)
      else throw new IllegalArgumentException(
        s"staged files not under ${partitionCols.mkString("/")} partition dirs — " +
          "partitionCols must name columns present in `repaired`")
    } else {

    // 3. olds = every visible data file currently in a repaired partition
    val olds = byPartition.keys.toSeq.sorted.flatMap { rel =>
      val dir = new HPath(lake, rel)
      if (fs.exists(dir)) Compact.listParquet(fs, dir) else Seq.empty
    }.map(fs.makeQualified(_).toString)
    val news = byPartition.toSeq.sortBy(_._1).flatMap { case (rel, files) =>
      files.map(f => (f, new HPath(lake, s"$rel/${f.getName}")))
    }

    // 4. write-ahead intent, then the same promote → mark → finish walk as
    //    Compact (shared recovery)
    FsOps.atomicWrite(hconf, fs, Compact.ctl(lake, "intent"),
      (manifestDir.map("M " + _).toSeq ++
        news.map(n => "N " + fs.makeQualified(n._2).toString) ++ olds.map("O " + _))
        .mkString("\n").getBytes("UTF-8"))
    if (crashBeforePromote) // test-only failpoint
      throw new RuntimeException("injected crash before promote")
    news.foreach { case (src, dest) =>
      fs.mkdirs(dest.getParent)
      FsOps.renameOrThrow(fs, src, dest)
    }
    fs.create(Compact.ctl(lake, "promoted"), true).close()
    Compact.finish(spark, fs, lake,
      olds, news.map(n => fs.makeQualified(n._2).toString), manifestDir)
    Compact.Stats(byPartition.size, olds.size, news.size)
    } // byPartition.nonEmpty
    } // withWriterLock
  }

}
