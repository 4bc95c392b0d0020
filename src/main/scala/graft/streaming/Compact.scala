package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Lake small-file compaction — the maintenance pass every long-running
  * micro-batch delivery needs (a 60 s flush cadence writes ~1.4k files per
  * partition-day; README.md:368-380's buffer sizing bounds file SIZE but
  * file COUNT still grows with uptime). Bin-packs each partition
  * directory's parquet files toward `targetBytes` and swaps them in with
  * crash-recoverable two-phase bookkeeping.
  *
  * Protocol (same write-ahead discipline as [[Deliver.promoteStage]]):
  *  1. plan: group data files by partition dir; skip partitions already
  *     packed (fewer files than the bin-packed count would be).
  *  2. stage: rewrite each picked partition under `_compact/stage/…`
  *     (underscore-prefixed ⇒ invisible to readers).
  *  3. intent: durably record {olds, news} before any lake mutation.
  *  4. promote news into the partition dirs.
  *  5. promoted marker — the commit point.
  *  6. fold the manifest chain into a snapshot naming news instead of olds
  *     (manifest readers flip atomically, and the fold lands BEFORE any
  *     physical delete so a racing manifest reader never resolves a chain
  *     naming retired files).
  *  7. delete olds (directory readers see the old∪new window between 4
  *     and 7 — the inherent cost of rename-based compaction, same as
  *     Hive/Spark `INSERT OVERWRITE` maintenance; manifest readers don't).
  *  8. clear markers.
  *
  * [[recover]] (always run first) rolls an interrupted pass BACK before the
  * promoted marker (delete whatever news landed; olds were untouched) and
  * FORWARD after it (re-delete olds, rewrite manifest) — a crash at any
  * step leaves the lake readable and never loses a row.
  *
  * Scale shape: the driver handles only file NAMES (O(#files) listing — at
  * object-store scale the listing comes from the manifest chain instead of
  * a tree walk when `manifestDir` is set); the data rewrite is executor
  * parallel per partition, reads only the partitions being packed, and
  * never shuffles (coalesce within a partition's files).
  */
object Compact {

  final case class Stats(partitionsPacked: Int, filesBefore: Int, filesAfter: Int)

  private[streaming] def ctl(lake: HPath, name: String) = new HPath(lake, s"_compact/$name")

  /** Exclusive per-lake maintenance lock. The whole maintenance family
    * (Compact/Backfill/Erase/Retention) shares `_compact/` control files
    * and assumes ONE writer: two interleaved passes could each read the
    * other's intent as their own crash to recover, promoting or retiring
    * the wrong files. The lock turns that silent interleave into a
    * fail-fast.
    *
    * The MECHANISM is a seam ([[LockProvider]], r9): the default
    * [[FsLeaseLock]] is a lock file + mtime-heartbeat lease — exact on
    * HDFS/local filesystems, NOT atomic on bare S3 — and every maintenance
    * entry point takes a `lock` argument, so an object-store deployment
    * swaps in an external lock service (DynamoDB/ZooKeeper/S3 conditional
    * PUT) with one argument, the same one-line-swap shape as the ingest
    * backend seam. Lease semantics, stale-reclaim, and [[forceUnlock]] are
    * documented on [[FsLeaseLock]].
    */
  private[streaming] def withWriterLock[T](fs: FileSystem, lake: HPath,
      leaseMs: Long = DefaultLeaseMs,
      lock: LockProvider = FsLeaseLock)(body: => T): T =
    lock.withLock(fs, lake, leaseMs)(body)

  /** Default maintenance-lock lease: long enough that a paused-but-alive
    * writer (GC, brief FS outage) keeps its lock across several missed
    * heartbeats, short enough that a dead writer doesn't block maintenance
    * for long.
    */
  private[streaming] val DefaultLeaseMs: Long = 15L * 60 * 1000

  /** Remove a stale maintenance lock left by a crashed writer. Only call
    * when no maintenance pass is running against the lake.
    */
  def forceUnlock(spark: SparkSession, lakeDir: String): Unit = {
    val lake = new HPath(lakeDir)
    val fs = lake.getFileSystem(spark.sessionState.newHadoopConf())
    FsOps.deleteOrThrow(fs, ctl(lake, "lock"), recursive = false)
  }

  /** One compaction pass over `lakeDir`. Returns what changed.
    *
    * `sortBy`: cluster each packed partition by these columns while
    * rewriting — files become disjoint sorted ranges
    * (`repartitionByRange` + `sortWithinPartitions`), so parquet row-group
    * and page min/max stats turn point/range predicates into data
    * skipping. Compaction has to rewrite the bytes anyway; ordering them
    * is the cheapest moment to buy every later scan's pruning (the
    * Z-order/cluster-by idea, one dimension at a time).
    */
  def run(spark: SparkSession, lakeDir: String, targetBytes: Long = 128L << 20,
      manifestDir: Option[String] = None, sortBy: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil,
      lock: LockProvider = FsLeaseLock): Stats = {
    require(sortBy.isEmpty || zorderBy.isEmpty,
      "pick ONE clustering: sortBy (1-D ranges) or zorderBy (multi-D Morton)")
    val hconf = spark.sessionState.newHadoopConf()
    val lake = new HPath(lakeDir)
    val fs = lake.getFileSystem(hconf)
    require(!fs.exists(new HPath(lake, "_spark_metadata")),
      "refusing to compact a FileStreamSink lake: its _spark_metadata log " +
        "names the original files; compact foreachBatch/manifest lakes only")
    withWriterLock(fs, lake, lock = lock) {
    recoverUnlocked(spark, lakeDir, manifestDir)

    // 1. plan — group visible data files by partition directory
    val byDir = dataFiles(fs, lake).groupBy(_.getParent)
    val picked = byDir.filter { case (_, files) =>
      val want = math.max(1, math.ceil(
        files.map(f => fs.getFileStatus(f).getLen).sum.toDouble / targetBytes).toInt)
      files.size > want
    }
    if (picked.isEmpty) Stats(0, 0, 0) else {

    // 2. stage the rewritten partitions (invisible under _compact/)
    val stage = fs.makeQualified(ctl(lake, "stage"))
    val lakePrefix = fs.makeQualified(lake).toString + "/"
    val news = picked.toSeq.sortBy(_._1.toString).zipWithIndex.flatMap {
      case ((dir, files), i) =>
        val total = files.map(f => fs.getFileStatus(f).getLen).sum
        val want = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
        // index-named stage subdirs: partition-layout-agnostic (hive dirs,
        // nested dirs, or files at the lake ROOT all stage the same way)
        val outDir = new HPath(stage, f"g$i%05d")
        val packed = spark.read.parquet(files.map(_.toString): _*)
        import org.apache.spark.sql.functions.col
        val shaped =
          if (zorderBy.nonEmpty) {
            // multi-D clustering: files become z-curve ranges, so min/max
            // stay tight on EVERY zorderBy column (see operators.ZOrder)
            val z = graft.operators.ZOrder.zValue(packed, zorderBy)
            packed.withColumn("__z", z).repartitionByRange(want, col("__z"))
              .sortWithinPartitions(col("__z")).drop("__z")
          } else if (sortBy.isEmpty) packed.coalesce(want)
          else packed.repartitionByRange(want, sortBy.map(col): _*)
            .sortWithinPartitions(sortBy.map(col): _*)
        // INT64 timestamps (scoped): compaction rewrites the bytes that
        // zone maps will describe; INT96 carries no min/max stats
        Deliver.withInt64Timestamps(spark) {
          shaped.write.mode("overwrite").option("compression", "snappy")
            .parquet(outDir.toString)
        }
        listParquet(fs, outDir).map { f =>
          (f, new HPath(dir, f.getName)) // promotes into the same partition dir
        }
    }
    val olds = picked.values.flatten.map(fs.makeQualified(_).toString).toSeq.sorted

    // 3. write-ahead intent: news, olds, AND the manifest dir are durable
    // before any lake mutation — recovery must fold the SAME manifest the
    // interrupted pass would have (a roll-forward that skipped the fold
    // would retire files the chain still names)
    FsOps.atomicWrite(hconf, fs, ctl(lake, "intent"),
      (manifestDir.map("M " + _).toSeq ++
        news.map(n => "N " + fs.makeQualified(n._2).toString) ++ olds.map("O " + _))
        .mkString("\n").getBytes("UTF-8"))

    // 4. promote; 5. commit point; 6. retire olds; 7. manifest; 8. clear
    news.foreach { case (src, dest) => FsOps.renameOrThrow(fs, src, dest) }
    fs.create(ctl(lake, "promoted"), true).close()
    finish(spark, fs, lake, olds, news.map(n => fs.makeQualified(n._2).toString), manifestDir)
    Stats(picked.size, olds.size, news.size)
    } // picked.nonEmpty
    } // withWriterLock
  }

  /** Roll an interrupted pass back (before the promoted marker) or forward
    * (after it). Idempotent; a no-op on a clean lake. Takes the writer
    * lock itself — safe to call standalone after a crash; the maintenance
    * ops call [[recoverUnlocked]] inside their own lock scope.
    */
  def recover(spark: SparkSession, lakeDir: String,
      manifestDir: Option[String] = None,
      lock: LockProvider = FsLeaseLock): Unit = {
    val lake = new HPath(lakeDir)
    val fs = lake.getFileSystem(spark.sessionState.newHadoopConf())
    withWriterLock(fs, lake, lock = lock) { recoverUnlocked(spark, lakeDir, manifestDir) }
  }

  private[streaming] def recoverUnlocked(spark: SparkSession, lakeDir: String,
      manifestDir: Option[String] = None): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val lake = new HPath(lakeDir)
    val fs = lake.getFileSystem(hconf)
    val intent = ctl(lake, "intent")
    if (!fs.exists(intent)) { // nothing in flight; drop any stale stage
      FsOps.deleteOrThrow(fs, ctl(lake, "stage"), recursive = true)
      return
    }
    val lines = FsOps.readString(fs, intent).split("\n").filter(_.nonEmpty)
    val news = lines.collect { case l if l.startsWith("N ") => l.drop(2) }.toSeq
    val olds = lines.collect { case l if l.startsWith("O ") => l.drop(2) }.toSeq
    // the interrupted pass's own manifest dir wins: a standalone
    // recover() must fold the same chain that pass was maintaining
    val mdir = lines.collectFirst { case l if l.startsWith("M ") => l.drop(2) }
      .orElse(manifestDir)
    if (fs.exists(ctl(lake, "promoted"))) {
      // commit point passed: news are all in place — finish retiring olds
      finish(spark, fs, lake, olds, news, mdir)
    } else {
      // not committed: olds are intact — remove any promoted news and stage
      news.foreach(n => FsOps.deleteOrThrow(fs, new HPath(n), recursive = false))
      FsOps.deleteOrThrow(fs, ctl(lake, "stage"), recursive = true)
      FsOps.deleteOrThrow(fs, intent, recursive = false)
    }
  }

  private[streaming] def finish(spark: SparkSession, fs: FileSystem, lake: HPath,
      olds: Seq[String], news: Seq[String], manifestDir: Option[String]): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    // Fold the manifest BEFORE physically retiring olds: a manifest reader
    // racing this pass then resolves either the pre-fold chain (olds still
    // on disk) or the folded snapshot (news promoted at step 4) — never a
    // chain naming deleted files. Crash between fold and delete rolls
    // forward idempotently (re-fold overwrites the same snapshot id,
    // deleteOrThrow tolerates already-gone olds).
    manifestDir.foreach { mdir =>
      val dir = new HPath(mdir)
      val mfs = dir.getFileSystem(hconf)
      val ids = ManifestChain.listTiered(mfs, dir).map(_._1)
      // Snapshot id = the max id actually folded, NOT max+1: a LIVE
      // delivery stream's next incremental is manifest-(max+1); a snapshot
      // claiming that id would make chainFiles drop the incremental — a
      // committed batch silently vanishing from the manifest view. At
      // id = max the snapshot shadows only manifests it provably folded
      // (chainUrls re-lists, so it reads a superset of `ids`), and every
      // concurrently committed batch lands strictly after it.
      val foldId = if (ids.isEmpty) 0L else ids.max
      // normalize through Path: "file:///x" and "file:/x" are the same file
      // but different strings — manifests from mixed producers may use either
      def norm(u: String) = new HPath(u).toString
      // the folded snapshot keeps the lake root the delivery stream recorded
      val base = Some(fs.makeQualified(lake).toString)
      if (ManifestChain.isParquetTier(mfs, dir)) {
        // graduated manifest folds IN ITS TIER, distributively: the url
        // table streams through executors with the retire/promote edits
        // applied — rendering the history back into one driver JSON is
        // the exact cliff the tier exists to avoid
        graft.sources.ManifestReader.foldManifestToParquet(spark, mdir,
          snapshotId = Some(foldId), drop = olds, add = news,
          addBase = base)
      } else {
      val oldSet = olds.map(norm).toSet
      val urls = ((ManifestChain.chainUrls(mfs, dir, Long.MaxValue)
        .map(norm).filterNot(oldSet) ++ news.map(norm)).distinct.sorted)
      FsOps.atomicWrite(hconf, mfs, new HPath(dir, f"manifest-$foldId%010d.snap.json"),
        ManifestChain.render(urls, base).getBytes("UTF-8"))
      }
      // Zone-map repair: the rewritten files are new urls with no sidecar
      // stats — without this, every compaction quietly degrades pruning
      // (never correctness) on exactly the files it touched. Fold the
      // existing sidecar chain and add footer harvests for the news,
      // restricted to the columns the sidecar already tracks; written as
      // a snapshot at foldId (same id discipline as the manifest fold).
      // Runs on recovery's roll-forward path too — idempotent overwrite.
      import graft.sources.ZoneMaps
      if (ZoneMaps.isParquetTier(hconf, mdir)) {
        // parquet-tier repair stays DISTRIBUTED: harvest only the rewritten
        // files (for the tracked columns) and fold them over the chain as
        // a new parquet snapshot — rendering the history back into one
        // driver-side JSON is the exact cliff the tier exists to avoid
        val cols = ZoneMaps.trackedCols(spark, mdir)
        if (cols.nonEmpty) {
          val newZones = ZoneMaps.fromFootersScaled(spark, news.map(norm), cols)
          ZoneMaps.foldToParquet(spark, mdir, extraOverlay = newZones,
            snapshotId = Some(foldId))
        }
      } else {
        val existing = ZoneMaps.load(hconf, mdir)
        if (existing.nonEmpty) {
          val cols = existing.valuesIterator.flatMap(_.keysIterator).toSeq.distinct
          val zmAll = existing ++ ZoneMaps.fromFooters(hconf, news.map(norm), cols)
          FsOps.atomicWrite(hconf, mfs, new HPath(dir, s"_zonemaps/zm-" +
            f"$foldId%010d.snap.json"), ZoneMaps.render(zmAll).getBytes("UTF-8"))
        }
      }
    }
    olds.foreach(o => FsOps.deleteOrThrow(fs, new HPath(o), recursive = false))
    FsOps.deleteOrThrow(fs, ctl(lake, "stage"), recursive = true)
    FsOps.deleteOrThrow(fs, ctl(lake, "promoted"), recursive = false)
    FsOps.deleteOrThrow(fs, ctl(lake, "intent"), recursive = false)
  }

  /** Every visible .parquet data file under the lake (skips `_`/`.` control
    * trees: `_commits`, `_staging`, `_spark_metadata`, `_compact`).
    */
  private def dataFiles(fs: FileSystem, lake: HPath): Seq[HPath] =
    FsOps.walkParquet(fs, lake, skipHidden = true)

  private[streaming] def listParquet(fs: FileSystem, dir: HPath): Seq[HPath] =
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
}
