package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.ManifestChain

/** S7 manifest-driven scan (README.md:291-303, 451-456): read ONLY the files
  * listed in the manifest chain — "never the folder" — so torn writes and
  * orphan files are invisible and re-delivered batches can't double-count.
  * The portable twin of the sink's `_spark_metadata` log for readers outside
  * Spark (the reference's Redshift `COPY ... FROM manifest`).
  *
  * Manifests are per-flush (incremental), with a periodic snapshot folding
  * the chain; the visible file set is latest-snapshot ∪ later-incrementals,
  * so a read lists O(chain-since-snapshot) manifest files, never the
  * stream's full history.
  */
object ManifestReader {

  /** Resolve the manifest chain and return the union of listed data files.
    * All chain manifests are parsed in ONE Spark json read (a single job
    * regardless of chain length); I/O goes through Hadoop FileSystem, so
    * remote manifest dirs resolve against the right store.
    */
  def latestManifestFiles(spark: SparkSession, manifestDir: String): Seq[String] = {
    val dir = new HPath(manifestDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val chain = ManifestChain.chainFiles(fs, dir)
    if (chain.isEmpty) Seq.empty
    else spark.read.option("multiLine", true)
      .schema("entries array<struct<mandatory boolean, url string>>")
      .json(chain.map(_.toString): _*)
      .select(explode(col("entries")).as("e"))
      .select(col("e.url")).distinct().collect().map(_.getString(0)).toSeq.sorted
  }

  /** Scan exactly the manifest-listed files (duplicate-proof, torn-write-proof). */
  def read(spark: SparkSession, manifestDir: String): DataFrame = {
    val files = latestManifestFiles(spark, manifestDir)
    require(files.nonEmpty, s"no manifest in $manifestDir")
    // basePath preserves the Hive partition columns of the listed files.
    // Graft-written manifests RECORD the writer's lake root — exact, no
    // guessing (an unpartitioned lake whose root dir is named `run=7` is
    // otherwise indistinguishable from a partition dir). Foreign
    // Redshift-style manifests carry no basePath → fall back to the path
    // heuristic: longest common parent dir, then peel trailing `name=value`
    // segments. Peeling from the END of the common prefix keeps an
    // ancestor directory that happens to contain '=' out of partition
    // discovery; unpartitioned manifests peel nothing.
    spark.read.option("basePath", resolveBasePath(spark, manifestDir, files))
      .parquet(files: _*)
  }

  /** The scan basePath: the writer-recorded lake root when the chain
    * agrees on one, else the longest common parent of the listed files
    * with trailing `name=value` partition segments peeled (the foreign-
    * manifest heuristic) — ONE implementation for every read path, so a
    * foreign manifest resolves identically through read/readWhere/asTable.
    */
  private def resolveBasePath(spark: SparkSession, manifestDir: String,
      files: Seq[String]): String =
    recordedBasePath(spark, manifestDir).getOrElse {
      val common = files
        .map(_.split('/').dropRight(1).toSeq) // parent dir segments
        .reduce((a, b) => a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1))
      common.reverse.dropWhile(seg =>
          seg.contains('=') && !seg.startsWith("=")).reverse
        .mkString("/")
    }

  /** Manifest scan with file-level zone-map pruning: resolve the visible
    * file set, drop every file whose persisted `_zonemaps` stats PROVE it
    * cannot satisfy `filter`, scan only the survivors, and re-apply the
    * filter (correctness never depends on pruning — files without stats,
    * unsupported predicate shapes, and domain mismatches are all kept).
    * At 100 TB this is the difference between opening every file so
    * parquet row-group stats can reject it and never scheduling the file
    * at all: the decision reads a manifest-sized sidecar, no data I/O.
    */
  def readWhere(spark: SparkSession, manifestDir: String,
      filter: org.apache.spark.sql.Column, blooms: Boolean = false): DataFrame = {
    val (kept, files, base) = pruned(spark, manifestDir, filter, blooms)
    val read = if (kept.nonEmpty) kept else files.take(1)
    spark.read.option("basePath", base).parquet(read: _*).where(filter)
  }

  /** (files kept, files total) under zone-map pruning — effectiveness
    * observability for tests and ops. `blooms` adds the parquet-bloom
    * equality stage (see [[ZoneMaps.bloomPrune]]).
    */
  def pruneStats(spark: SparkSession, manifestDir: String,
      filter: org.apache.spark.sql.Column, blooms: Boolean = false): (Int, Int) = {
    val (kept, files, _) = pruned(spark, manifestDir, filter, blooms)
    (kept.size, files.size)
  }

  private def pruned(spark: SparkSession, manifestDir: String,
      filter: org.apache.spark.sql.Column,
      blooms: Boolean = false): (Seq[String], Seq[String], String) = {
    val files = latestManifestFiles(spark, manifestDir)
    require(files.nonEmpty, s"no manifest in $manifestDir")
    val base = resolveBasePath(spark, manifestDir, files)
    // tier-aware: a parquet-snapshot sidecar is pruned distributively (the
    // driver never materializes the zones map), a JSON chain through the
    // driver map — one decision point for readWhere/pruneStats/asTable
    val kept = ZoneMaps.resolvedPredicate(spark, base, files.head, filter) match {
      case None => files
      case Some(pred) =>
        val zoneKept = ZoneMaps.pruneResolved(spark, manifestDir, pred, files)
        if (!blooms) zoneKept
        else ZoneMaps.bloomPruneScaled(spark, zoneKept, pred)._1
    }
    (kept, files, base)
  }

  /** The manifest lake as a pruning TABLE: a DataFrame whose every scan —
    * `.where`, SQL over a temp view, join keys pushed by Catalyst — skips
    * files through the `_zonemaps` sidecar (and parquet blooms when
    * `blooms`) inside Spark's own planning, via a custom FileIndex (the
    * Delta TahoeFileIndex shape). Prefer this over [[readWhere]] when the
    * lake feeds arbitrary downstream query shapes: the pruning decision
    * re-evaluates per scan against whatever filters Catalyst derives.
    */
  def asTable(spark: SparkSession, manifestDir: String,
      blooms: Boolean = false): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    val dirPath = new HPath(manifestDir)
    val fs = dirPath.getFileSystem(hconf)
    def sig(): String = ManifestChain.chainFiles(fs, dirPath)
      .map(_.getName).sorted.mkString(";")
    // signature BEFORE the listing: a flush landing between the two is
    // then included in `files` AND still looks changed to the first scan
    // (a harmless extra refresh) — sampled after, it would be consumed
    // unseen and the view would miss it until the NEXT manifest change
    val sig0 = sig()
    val files = latestManifestFiles(spark, manifestDir)
    require(files.nonEmpty, s"no manifest in $manifestDir")
    val base = resolveBasePath(spark, manifestDir, files)
    // zones resolve PER SCAN through ZoneMaps.pruneResolved (signature-
    // cached, tier-aware): a flush after registration is pruned with its
    // own fresh sidecar stats, not a registration-time snapshot
    val prune = (dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
        urls: Seq[String]) => {
      val pred = dataFilters.reduce(
        org.apache.spark.sql.catalyst.expressions.And)
      val zoneKept = ZoneMaps.pruneResolved(spark, manifestDir, pred, urls)
      val kept =
        if (!blooms) zoneKept
        else ZoneMaps.bloomPruneScaled(spark, zoneKept, pred)._1
      kept.toSet
    }
    // LIVE file set (r11 verdict ask #3): re-resolve the manifest chain
    // when the manifest directory's listing changes — a view over a
    // delivering lake sees post-registration flushes without
    // re-registration. The chain signature is one FS listing per scan;
    // the (Spark-job) manifest parse re-runs only on change, and the
    // change is consumed via the COMMIT callback only after the new index
    // installs — a failed parse/build/layout-check retries next scan
    // instead of silently pinning the stale file set.
    val lastSig = new java.util.concurrent.atomic.AtomicReference[String](sig0)
    val resolve: () => Option[(Seq[org.apache.hadoop.fs.Path], () => Unit)] =
      () => {
        val now = sig()
        if (now == lastSig.get()) None
        else {
          val fl = latestManifestFiles(spark, manifestDir)
            .map(new org.apache.hadoop.fs.Path(_))
          Some((fl, () => lastSig.set(now)))
        }
      }
    org.apache.spark.sql.graftbridge.ZoneMapFileIndex.table(spark,
      files.map(new org.apache.hadoop.fs.Path(_)),
      new org.apache.hadoop.fs.Path(base), prune, Some(resolve))
  }

  /** Rebuild the zone-map sidecar from the CURRENT visible file set's
    * footers — the one-call refresh after maintenance (Compact/Retention)
    * rewrote files the incremental sidecars described. Written as a
    * snapshot past every live batch id so the next reader resolves only it.
    */
  def refreshZoneMaps(spark: SparkSession, manifestDir: String,
      cols: Seq[String] = Nil): Int = {
    val hconf = spark.sessionState.newHadoopConf()
    val files = latestManifestFiles(spark, manifestDir)
    // harvest distributes past ~2k files (a Spark job over the file list)
    val zones = ZoneMaps.fromFootersScaled(spark, files, cols)
    val dir = new HPath(manifestDir)
    val fs = dir.getFileSystem(hconf)
    val maxBatch = ManifestChain.list(fs, dir).map(_._1).maxOption.getOrElse(0L)
    if (ZoneMaps.isParquetTier(hconf, manifestDir)) {
      // a graduated lake refreshes IN ITS TIER: fold the fresh harvest to
      // a parquet snapshot — ZoneMaps.write would emit the whole live
      // set's zones as one giant JSON incremental, the exact driver-sized
      // artifact the tier exists to retire
      ZoneMaps.foldToParquet(spark, manifestDir, extraOverlay = zones,
        snapshotId = Some(maxBatch))
    } else {
      // snapshot AT maxBatch, not maxBatch+1: an equal-id snapshot wins
      // over the incremental (whose zones this refresh already folded in
      // via the live file set), while maxBatch+1 would permanently SHADOW
      // the NEXT streaming batch's incremental sidecar — and if that batch
      // hit snapshot cadence, its fold (upToExclusive = batchId) would
      // silently discard this refresh's freshly-harvested stats for
      // compacted files
      ZoneMaps.write(hconf, manifestDir, maxBatch,
        zones, compactEvery = 1) // force a snapshot fold
    }
    files.size
  }

  /** The lake root recorded by the manifest writer, when all chain
    * manifests that record one agree (path-normalized). Disagreement means
    * mixed producers — fall back to the heuristic rather than guess.
    */
  private def recordedBasePath(spark: SparkSession, manifestDir: String): Option[String] = {
    val dir = new HPath(manifestDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val bases = ManifestChain.chainFiles(fs, dir)
      .flatMap(p => ManifestChain.parseBasePath(graft.streaming.FsOps.readString(fs, p)))
      .map(b => new HPath(b).toString).distinct
    if (bases.size == 1) Some(bases.head) else None
  }
}
