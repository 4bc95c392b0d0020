package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Targeted key erasure ("right to be forgotten") over an immutable parquet
  * lake — the GDPR operation the reference's 365-day replay retention
  * (README.md:83) exists to serve: every row for a set of subject keys is
  * removed by copy-on-write, rewriting ONLY the data files that actually
  * contain those keys.
  *
  * Two phases, both key-pruned:
  *  1. locate: one column-pruned scan of (keyCol, `_metadata.file_path`)
  *     semi-joined against the (broadcast) key set → the affected file
  *     list. At 100 TB this reads one column of the lake and ships file
  *     NAMES, not rows, to the driver — O(affected files) driver state.
  *  2. rewrite: only the affected files are read in full, anti-joined
  *     against the keys, and swapped in through the same crash-recoverable
  *     intent → promote → commit-marker → manifest-fold protocol as
  *     [[Compact]]/[[Backfill]] (shared control files, shared
  *     [[Compact.recover]]). Files without a target key are not opened,
  *     rewritten, or renamed — an erasure touching 0.01% of keys rewrites
  *     ~0.01% of the lake.
  *
  * A file whose every row is erased simply disappears (retired with no
  * replacement). Partition pruning composes: if the caller knows the keys
  * live in a partition range, pre-filtering `lake` narrows the locate scan.
  */
object Erase {

  /** A delivered lake to erase from: the subject key column as it appears
    * in the lake, and the lake's manifest chain (folded at the commit
    * point when present).
    */
  final case class LakeTarget(dir: String, keyCol: String,
      manifestDir: Option[String] = None)

  /** A persisted index to erase from. The fingerprint variant carries
    * where its source texts live — the fps must be computed from the
    * texts BEFORE any lake erase deletes them, which is exactly the
    * ordering [[everywhere]] enforces.
    */
  sealed trait IndexTarget { def dir: String }
  final case class IvfTarget(dir: String) extends IndexTarget
  final case class PqIvfTarget(dir: String) extends IndexTarget
  final case class SqIvfTarget(dir: String) extends IndexTarget
  final case class EmbeddingTarget(dir: String) extends IndexTarget
  final case class NearTarget(dir: String) extends IndexTarget
  final case class FingerprintTarget(dir: String, textLakeDir: String,
      keyCol: String, textCol: String) extends IndexTarget

  /** A CDC upsert table (erased through its whole time-travel history). */
  final case class UpsertTarget(dir: String, keyCol: String)

  final case class EverywhereReport(
      indexes: Seq[(String, IndexErase.Report)],
      lakes: Seq[(String, Compact.Stats)],
      tables: Seq[(String, UpsertSink.EraseStats)])

  /** TOTAL erasure of a subject-id set, in the one safe order — the
    * single entry point that makes the documented-only sequencing
    * (IndexErase's "fingerprints before the lake" contract) impossible to
    * get wrong (r13 verdict ask #3):
    *
    *  1. fingerprint indexes FIRST — the fps are computed from the
    *     subjects' texts, which step 3 deletes; after the lake erase they
    *     are unrecoverable and would sit in the index forever;
    *  2. every other persisted index (IVF / PQ / SQ8 / embedding /
    *     near-dup — full vectors, codes, signatures, shingles);
    *  3. the lakes (file-pruned copy-on-write, manifest folded);
    *  4. the upsert tables' whole retained commit history.
    *
    * Each lake/table/index component takes its own single lock
    * acquisition via its entry point; every store gets an `_erased`
    * tombstone so replays cannot resurrect the subjects ([[ErasedKeys]]).
    * `ids` is a single-column frame of subject keys, materialized once up
    * front (it may derive from a store this call is about to rewrite).
    */
  def everywhere(spark: SparkSession, ids: DataFrame,
      lakes: Seq[LakeTarget],
      indexes: Seq[IndexTarget] = Nil,
      tables: Seq[UpsertTarget] = Nil,
      lock: LockProvider = FsLeaseLock): EverywhereReport = {
    val mat = ids.distinct().persist()
    try {
      mat.count()
      // 1. fingerprints, while the texts still exist
      val fpReports = indexes.collect { case f: FingerprintTarget =>
        val fps = spark.read.parquet(f.textLakeDir)
          .join(broadcast(mat.toDF(f.keyCol)), Seq(f.keyCol), "left_semi")
          .select(graft.functions.TextFunctions.fingerprint(col(f.textCol)).as("fp"))
          .distinct()
        f.dir -> IndexErase.eraseFingerprints(spark, f.dir, fps, lock)
      }
      // 2. the other indexes
      val idxReports = indexes.collect {
        case i: IvfTarget =>
          i.dir -> IndexErase.eraseFromIvfIndex(spark, i.dir, mat, lock)
        case i: PqIvfTarget =>
          i.dir -> IndexErase.eraseFromPqIvfIndex(spark, i.dir, mat, lock)
        case i: SqIvfTarget =>
          i.dir -> IndexErase.eraseFromSqIvfIndex(spark, i.dir, mat, lock)
        case i: EmbeddingTarget =>
          i.dir -> IndexErase.eraseFromEmbeddingIndex(spark, i.dir, mat, lock)
        case i: NearTarget =>
          i.dir -> IndexErase.eraseFromNearIndex(spark, i.dir, mat, lock)
      }
      // 3. the lakes
      val lakeReports = lakes.map(l => l.dir ->
        eraseKeys(spark, l.dir, l.keyCol, mat.toDF(l.keyCol), l.manifestDir,
          lock = lock))
      // 4. the upsert tables' retained history
      val tblReports = tables.map(t => t.dir ->
        UpsertSink.eraseKeys(spark, t.dir, t.keyCol, mat.toDF(t.keyCol), lock))
      EverywhereReport(fpReports ++ idxReports, lakeReports, tblReports)
    } finally { mat.unpersist(); () }
  }

  /** Erase every row whose `keyCol` appears in `keys` (single-column frame;
    * deduplicated and broadcast — GDPR request batches are small by nature).
    * Returns (affected partition dirs, files retired, files written).
    *
    * `maxAffectedFiles` bounds the driver-side file list (the one
    * `collect()` in the operation): an erasure touching more files than
    * the cap fails fast BEFORE any rewrite starts — such a request
    * (hot key, wrong key column) should be split by partition range or
    * run with an explicitly raised cap, not silently balloon driver
    * memory. The limit is applied in the scan, so the driver never holds
    * more than cap+1 paths even when failing.
    */
  def eraseKeys(spark: SparkSession, lakeDir: String, keyCol: String,
      keys: DataFrame, manifestDir: Option[String] = None,
      maxAffectedFiles: Int = 100000,
      lock: LockProvider = FsLeaseLock,
      tombstone: Boolean = true): Compact.Stats = {
    // materialize the key set BEFORE the erase: `keys` is lazily planned
    // and often derives from the very lake being erased (subjects =
    // lake.select(key).where(...)) — re-executing it after the rewrite
    // would scan retired files (or worse, resolve to an empty set and
    // record nothing)
    val mat = keys.toDF(keyCol).distinct().persist()
    try {
      mat.count()
      val stats = eraseKeysInner(spark, lakeDir, keyCol, mat, manifestDir,
        maxAffectedFiles, lock)
      // tombstone AFTER the erase succeeded (a failed erase must not declare
      // the keys gone), and even when it was a no-op — the declaration "this
      // key must not reappear" guards future replays either way. IndexErase
      // component calls pass tombstone = false and record once at their
      // index root instead.
      if (tombstone) ErasedKeys.record(spark, lakeDir, keyCol, mat)
      stats
    } finally { mat.unpersist(); () }
  }

  private def eraseKeysInner(spark: SparkSession, lakeDir: String, keyCol: String,
      keys: DataFrame, manifestDir: Option[String],
      maxAffectedFiles: Int,
      lock: LockProvider): Compact.Stats = {
    val hconf = spark.sessionState.newHadoopConf()
    val lake = new HPath(lakeDir)
    val fs = lake.getFileSystem(hconf)
    // recovery FIRST (an interrupted maintenance pass must complete even
    // when this request turns out to be a no-op), then a SHORT-CIRCUIT
    // emptiness guard: a request against a not-yet-delivered or
    // already-emptied lake is a no-op, not a job failure (the scan below
    // would throw on schema inference)
    Compact.withWriterLock(fs, lake, lock = lock) {
    Compact.recoverUnlocked(spark, lakeDir, manifestDir)
    if (!FsOps.anyParquet(fs, lake, skipHidden = true))
      return Compact.Stats(0, 0, 0)

    val keySet = broadcast(keys.toDF(keyCol).distinct())

    // 1. locate affected files: column-pruned scan + broadcast semi-join.
    // limit(cap+1) bounds the collect itself — the cap check cannot OOM
    // the driver on the way to its own error message
    val affected = spark.read.parquet(lakeDir)
      .select(col(keyCol), col("_metadata.file_path").as("__f"))
      .join(keySet, Seq(keyCol), "left_semi")
      .select(col("__f")).distinct()
      .limit(maxAffectedFiles + 1)
      .collect().map(r => fs.makeQualified(new HPath(r.getString(0))))
      .toSeq.sortBy(_.toString)
    if (affected.size > maxAffectedFiles)
      throw new IllegalStateException(
        s"erasure of $keyCol keys in $lakeDir touches more than $maxAffectedFiles files: " +
          "split the request by partition range (pre-filter the lake) or raise " +
          "maxAffectedFiles explicitly — refusing before any rewrite starts")
    if (affected.isEmpty) return Compact.Stats(0, 0, 0)

    // 2. rewrite ONLY the affected files, erased, in ONE job: basePath
    //    recovers the hive partition columns, the partitioned stage write
    //    regenerates the same dirs, and staged files map back by relative
    //    path (a per-partition-dir job loop would launch O(partitions)
    //    jobs — a key present in every hour of a year-deep lake must not
    //    cost 8760 scheduler round-trips)
    val stage = fs.makeQualified(Compact.ctl(lake, "stage"))
    val lakePrefix = fs.makeQualified(lake).toString + "/"
    val partCols = affected.head.toString.stripPrefix(lakePrefix)
      .split('/').dropRight(1).filter(_.contains('=')).map(_.split('=')(0)).toSeq
    val erased = spark.read.option("basePath", lakeDir)
      .parquet(affected.map(_.toString): _*)
      .join(keySet, Seq(keyCol), "left_anti")
    val writer = erased.write.mode("overwrite").option("compression", "snappy")
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(stage.toString)
    val stagePrefix = stage.toString + "/"
    val news = FsOps.walkParquet(fs, stage, skipHidden = true).map { f =>
      val rel = fs.makeQualified(f).toString.stripPrefix(stagePrefix)
      (f, new HPath(lake, rel))
    }.sortBy(_._2.toString)
    val olds = affected.map(_.toString)

    FsOps.atomicWrite(hconf, fs, Compact.ctl(lake, "intent"),
      (manifestDir.map("M " + _).toSeq ++
        news.map(n => "N " + fs.makeQualified(n._2).toString) ++ olds.map("O " + _))
        .mkString("\n").getBytes("UTF-8"))
    news.foreach { case (src, dest) =>
      fs.mkdirs(dest.getParent)
      FsOps.renameOrThrow(fs, src, dest)
    }
    fs.create(Compact.ctl(lake, "promoted"), true).close()
    Compact.finish(spark, fs, lake,
      olds, news.map(n => fs.makeQualified(n._2).toString), manifestDir)
    Compact.Stats(affected.map(_.getParent).distinct.size, olds.size, news.size)
    } // withWriterLock
  }

}
