package graft

import java.sql.Timestamp

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.{ManifestReader, ShardedLog}
import graft.streaming.{Compact, Deliver, ManifestChain}

/** The r13 parquet MANIFEST tier: fold parity with the JSON chain,
  * post-graduation incremental visibility and writer behavior (no more
  * JSON folds; cadence self-folds), Compact edits folded in-tier, the
  * swap-window aside substitution, and crash recovery.
  */
class ManifestTierSpec extends SparkSuite {
  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()
  private def hfs(d: String) = new HPath(d).getFileSystem(hconf)

  private val payloadSchema = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("value", DoubleType), StructField("ts", TimestampType),
      StructField("event_id", LongType)))),
    StructField("metadata", StructType(Seq(StructField("op", StringType))))))

  private def deliver(base: String, nEvents: Int, skip: Int = 0,
      compactEvery: Int = 10): Unit = {
    val events = graft.queries.Registry.tbl(spark, sfDir, "events")
      .orderBy("event_id").limit(skip + nEvents)
      .orderBy(desc("event_id")).limit(nEvents)
    ShardedLog.put(ShardedLog.fromEvents(events), s"$base/log")
    val q = Deliver.start(ShardedLog.readStream(spark, s"$base/log"), payloadSchema,
      Deliver.Config(s"$base/lake", s"$base/ck", manifestDir = Some(s"$base/manifest"),
        zoneMapCols = Seq("ts", "event_id"),
        manifestCompactEvery = compactEvery,
        trigger = Trigger.AvailableNow(),
        clock = Some(Timestamp.valueOf("2025-11-07 14:32:09.13"))))
    q.awaitTermination()
  }

  test("fold parity: urls, basePath, and read() identical across the graduation") {
    val base = tmpDir("graft-mt-fold-")
    deliver(base, 400)
    val mdir = s"$base/manifest"
    val before = ManifestReader.latestManifestFiles(spark, mdir)
    val readBefore = ManifestReader.read(spark, mdir)
      .agg(count(lit(1)), sum(col("event_id"))).head

    val id = ManifestReader.foldManifestToParquet(spark, mdir)
    assert(ManifestChain.isParquetTier(hfs(mdir), new HPath(mdir)))
    graft.operators.IndexMeta.invalidateAll() // cold-path read
    val after = ManifestReader.latestManifestFiles(spark, mdir)
    assert(after.map(new HPath(_).toString) ==
      before.map(new HPath(_).toString),
      s"url parity broken: ${before.size} -> ${after.size}")
    val readAfter = ManifestReader.read(spark, mdir)
      .agg(count(lit(1)), sum(col("event_id"))).head
    assert(readAfter == readBefore)
    // partition columns still resolve (recorded base path survives the fold)
    assert(ManifestReader.read(spark, mdir).columns.contains("hour"),
      s"partition columns lost: ${ManifestReader.read(spark, mdir).columns.toSeq}")
    // shadowed JSON pieces were pruned; the snapshot leads
    val pieces = ManifestChain.listTiered(hfs(mdir), new HPath(mdir))
    assert(pieces.count(_._2 == ManifestChain.SnapPq) == 1)
    assert(!pieces.exists(e => e._2 != ManifestChain.SnapPq && e._1 <= id),
      s"shadowed pieces survive: $pieces")
  }

  test("post-graduation: incrementals visible, writer never JSON-folds, cadence self-folds") {
    val base = tmpDir("graft-mt-inc-")
    deliver(base, 300, compactEvery = 1) // batch 0: incremental (cadence needs id > 0)
    val mdir = s"$base/manifest"
    ManifestReader.foldManifestToParquet(spark, mdir)
    val atFold = ManifestReader.latestManifestFiles(spark, mdir).size

    // a second delivery: batch 1 hits cadence=1 — on the graduated chain it
    // must write an incremental + SELF-FOLD to parquet, never a JSON fold
    deliver(base, 300, skip = 300, compactEvery = 1)
    val fs = hfs(mdir)
    val names = fs.listStatus(new HPath(mdir)).map(_.getPath.getName).toSeq
    assert(!names.exists(_.endsWith(".snap.json")),
      s"graduated chain grew a JSON snapshot: $names")
    assert(names.exists(_.endsWith(".snap.pq")), s"no parquet snapshot: $names")
    val after = ManifestReader.latestManifestFiles(spark, mdir)
    assert(after.size > atFold, "the new batch's files must be visible")
    // the self-fold consumed the incrementals (chain is one snapshot)
    val (snap, incs) = ManifestChain.resolveTiered(fs, new HPath(mdir))
    assert(snap.exists(_._2 == ManifestChain.SnapPq) && incs.isEmpty,
      s"self-fold should leave a lone parquet head: $snap / $incs")
    // read parity with a plain lake scan
    val viaManifest = ManifestReader.read(spark, mdir)
      .agg(count(lit(1)), sum(col("event_id"))).head
    val plain = spark.read.parquet(s"$base/lake")
      .agg(count(lit(1)), sum(col("event_id"))).head
    assert(viaManifest == plain)
  }

  test("Compact on a graduated lake folds retire/promote edits in-tier") {
    val base = tmpDir("graft-mt-compact-")
    deliver(base, 500)
    val mdir = s"$base/manifest"
    ManifestReader.foldManifestToParquet(spark, mdir)
    val beforeRead = ManifestReader.read(spark, mdir)
      .agg(count(lit(1)), sum(col("event_id"))).head

    val stats = Compact.run(spark, s"$base/lake", targetBytes = 512L << 20,
      manifestDir = Some(mdir))
    assert(stats.filesBefore > stats.filesAfter && stats.filesAfter > 0)
    val fs = hfs(mdir)
    val names = fs.listStatus(new HPath(mdir)).map(_.getPath.getName).toSeq
    assert(!names.exists(_.endsWith(".snap.json")),
      s"compaction rendered a JSON fold on a graduated chain: $names")
    // the manifest names only live files, and results are unchanged
    val files = ManifestReader.latestManifestFiles(spark, mdir)
    files.foreach(f => assert(fs.exists(new HPath(f)), s"manifest names retired file $f"))
    val afterRead = ManifestReader.read(spark, mdir)
      .agg(count(lit(1)), sum(col("event_id"))).head
    assert(afterRead == beforeRead)
    // zone pruning still fires through the repaired sidecar
    val cut = graft.queries.Registry.tbl(spark, sfDir, "events")
      .orderBy("event_id").limit(500)
      .agg(expr("percentile_approx(ts, 0.9)")).head.getTimestamp(0)
    val (kept, total) = ManifestReader.pruneStats(spark, mdir, col("ts") >= lit(cut))
    assert(kept > 0, s"post-compaction pruning: $kept/$total")
  }

  test("graduation AFTER a JSON-tier retire never resurrects deleted files") {
    // the JSON tier keeps shadowed incrementals forever; a Compact fold
    // retires files and excludes them from its JSON snapshot — the
    // graduation fold must resolve the JSON chain (snapshot + later
    // pieces), not scoop every piece on disk back in
    val base = tmpDir("graft-mt-grad-")
    deliver(base, 500)
    val mdir = s"$base/manifest"
    val fs = hfs(base)
    val preFiles = ManifestReader.latestManifestFiles(spark, mdir)
    val stats = Compact.run(spark, s"$base/lake", targetBytes = 512L << 20,
      manifestDir = Some(mdir)) // JSON-tier fold with drops
    assert(stats.filesBefore > stats.filesAfter)
    val retired = preFiles.map(new HPath(_).toString).toSet --
      ManifestReader.latestManifestFiles(spark, mdir).map(new HPath(_).toString)
    assert(retired.nonEmpty, "fixture: compaction must have retired files")
    // old incrementals naming the retired files still exist on disk
    assert(ManifestChain.list(fs, new HPath(mdir)).exists(!_._2),
      "fixture: shadowed incrementals must still be present")

    ManifestReader.foldManifestToParquet(spark, mdir)
    graft.operators.IndexMeta.invalidateAll()
    val after = ManifestReader.latestManifestFiles(spark, mdir)
      .map(new HPath(_).toString).toSet
    assert(after.intersect(retired).isEmpty,
      s"graduation resurrected ${after.intersect(retired).size} retired file(s)")
    // and the read is whole: every named file exists, results match plain
    after.foreach(f => assert(fs.exists(new HPath(f)), s"names deleted file $f"))
    val viaManifest = ManifestReader.read(spark, mdir)
      .agg(count(lit(1)), sum(col("event_id"))).head
    val plain = spark.read.parquet(s"$base/lake")
      .agg(count(lit(1)), sum(col("event_id"))).head
    assert(viaManifest == plain)
  }

  test("swap-window aside substitutes for the missing head; fold recovers it") {
    val base = tmpDir("graft-mt-aside-")
    deliver(base, 300)
    val mdir = s"$base/manifest"
    val id = ManifestReader.foldManifestToParquet(spark, mdir)
    val want = ManifestReader.latestManifestFiles(spark, mdir)
    val fs = hfs(mdir)
    val target = new HPath(mdir, f"manifest-$id%010d.snap.pq")
    val aside = new HPath(mdir, f".old-manifest-$id%010d.snap.pq")
    assert(fs.rename(target, aside)) // simulate a crash inside the swap
    graft.operators.IndexMeta.invalidateAll()
    // a reader in the window resolves the aside copy — NEVER a partial set
    val inWindow = ManifestReader.latestManifestFiles(spark, mdir)
    assert(inWindow == want, "the swap window must serve the pre-fold view")
    // the next fold restores the aside and converges
    val id2 = ManifestReader.foldManifestToParquet(spark, mdir)
    assert(id2 == id && fs.exists(target) && !fs.exists(aside))
    graft.operators.IndexMeta.invalidateAll()
    assert(ManifestReader.latestManifestFiles(spark, mdir) == want)
  }

  test("self-fold defers to a held maintenance lock (no blind replace of edits)") {
    val base = tmpDir("graft-mt-lock-")
    deliver(base, 200, compactEvery = 1)
    val mdir = s"$base/manifest"
    ManifestReader.foldManifestToParquet(spark, mdir)
    val fs = hfs(base)
    // a maintenance writer holds the lake lock (fresh mtime = live lease)
    val lock = new HPath(s"$base/lake/_compact/lock")
    fs.mkdirs(lock.getParent)
    fs.create(lock, false).close()
    try {
      val before = ManifestChain.resolveTiered(fs, new HPath(mdir))._1.get
      deliver(base, 200, skip = 200, compactEvery = 1) // cadence batch: self-fold must SKIP
      val (snapAfter, incs) = ManifestChain.resolveTiered(fs, new HPath(mdir))
      assert(snapAfter.get._1 == before._1,
        "the self-fold must not advance the snapshot under a held lock")
      assert(incs.nonEmpty, "the batch's incremental must still be visible")
      // nothing lost: reads resolve snapshot + incrementals
      val viaManifest = ManifestReader.read(spark, mdir)
        .agg(count(lit(1))).head.getLong(0)
      val plain = spark.read.parquet(s"$base/lake").count()
      assert(viaManifest == plain)
    } finally fs.delete(lock, false)
    // lock released: the next fold converges the chain
    ManifestReader.foldManifestToParquet(spark, mdir)
    val (snap2, incs2) = ManifestChain.resolveTiered(fs, new HPath(mdir))
    assert(snap2.exists(_._2 == ManifestChain.SnapPq) && incs2.isEmpty)
  }

  test("a JSON-tier cadence fold defers to a held maintenance lock (no stale shadow)") {
    // r14 (caught by the maintenance soak): the JSON-tier cadence snapshot
    // fold ran UNLOCKED — a locked Compact/Erase fold landing between the
    // stream's chain read and its put was shadowed by the stream's
    // higher-id snapshot with stale urls, resurrecting files maintenance
    // then deleted (manifest readers opened missing paths). The fold now
    // takes the same maintenance try-lock as the pq-tier and zone
    // self-folds; busy → the always-safe incremental.
    val base = tmpDir("graft-mt-jlock-")
    deliver(base, 100, compactEvery = 1) // batch 0: plain incremental
    val mdir = s"$base/manifest"
    val fs = hfs(base)
    val lock = new HPath(s"$base/lake/_compact/lock")
    fs.mkdirs(lock.getParent)
    fs.create(lock, false).close()
    try {
      // batch 1 hits cadence on the JSON chain while a maintenance writer
      // holds the lake — the snapshot fold must skip to an incremental
      deliver(base, 100, skip = 100, compactEvery = 1)
      val names = fs.listStatus(new HPath(mdir)).map(_.getPath.getName).toSeq
      assert(!names.exists(_.endsWith(".snap.json")),
        s"a JSON snapshot was installed under a held maintenance lock: $names")
      // nothing lost: the incremental keeps every committed url visible
      graft.operators.IndexMeta.invalidateAll()
      assert(ManifestReader.read(spark, mdir).count() ==
        spark.read.parquet(s"$base/lake").count())
    } finally { fs.delete(lock, false); () }
    // lock released: the next cadence folds normally
    deliver(base, 100, skip = 200, compactEvery = 1)
    val names2 = hfs(mdir).listStatus(new HPath(mdir)).map(_.getPath.getName).toSeq
    assert(names2.exists(_.endsWith(".snap.json")),
      s"cadence folding did not resume after the lock release: $names2")
    graft.operators.IndexMeta.invalidateAll()
    assert(ManifestReader.read(spark, mdir).count() ==
      spark.read.parquet(s"$base/lake").count())
  }

  test("a graduation racing the cadence JSON fold is never shadowed (no url loss)") {
    // r13 advice (medium): a foldManifestToParquet landing between the
    // writer's tier check and its JSON-snapshot install used to be
    // invisible — the writer's own higher-id .snap.json led the chain, so
    // the "leads the chain" re-check passed, the snapshot shadowed the
    // parquet head, and (because graduation had already pruned the JSON
    // pieces) every pre-graduation url vanished from manifest reads. The
    // fix detects graduation by parquet-snapshot EXISTENCE and installs
    // the JSON snapshot only after a post-check window.
    val base = tmpDir("graft-mt-race-")
    deliver(base, 300, compactEvery = 1) // batch 0: incremental
    val mdir = s"$base/manifest"
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Deliver.mfFoldTestHook = () =>
      if (fired.compareAndSet(false, true)) {
        ManifestReader.foldManifestToParquet(spark, mdir)
        ()
      }
    try {
      // batch 1 hits cadence on a (still) JSON chain → enters the snapshot
      // fold; the hook graduates the lake inside the race window
      deliver(base, 300, skip = 300, compactEvery = 1)
    } finally Deliver.mfFoldTestHook = () => ()
    assert(fired.get, "fixture: the graduation hook must have fired")
    val fs = hfs(mdir)
    val names = fs.listStatus(new HPath(mdir)).map(_.getPath.getName).toSeq
    assert(!names.exists(_.endsWith(".snap.json")),
      s"the racing JSON fold shadowed the graduation: $names")
    assert(ManifestChain.isParquetTier(fs, new HPath(mdir)),
      s"parquet head must lead the chain: $names")
    // nothing lost: BOTH batches' files resolve through the manifest
    graft.operators.IndexMeta.invalidateAll()
    val viaManifest = ManifestReader.read(spark, mdir)
      .agg(count(lit(1)), sum(col("event_id"))).head
    val plain = spark.read.parquet(s"$base/lake")
      .agg(count(lit(1)), sum(col("event_id"))).head
    assert(viaManifest == plain,
      s"manifest lost urls across the race: $viaManifest vs $plain")
  }

  test("corrupt parquet snapshot fails FAST (the swap retry is not-found-scoped)") {
    // the ×3 resolve retry exists for the fold swap window (FILE_NOT_EXIST
    // on a just-replaced snapshot); a deterministic failure — a corrupted
    // snapshot part file — must surface on the FIRST read, not after two
    // futile replays. (The swap window itself is covered reader-side by
    // the aside-substitution test above, which resolves without error.)
    val base = tmpDir("graft-mt-corrupt-")
    deliver(base, 200)
    val mdir = s"$base/manifest"
    val id = ManifestReader.foldManifestToParquet(spark, mdir)
    val fs = hfs(mdir)
    val snap = new HPath(mdir, f"manifest-$id%010d.snap.pq")
    val part = fs.listStatus(snap).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val out = fs.create(part, true)
    try out.write("this is not a parquet file".getBytes("UTF-8")) finally out.close()
    graft.operators.IndexMeta.invalidateAll()
    val before = ManifestReader.mfRetries.get()
    intercept[Throwable] { ManifestReader.latestManifestFiles(spark, mdir) }
    assert(ManifestReader.mfRetries.get() == before,
      "a deterministic corrupt-snapshot failure must not take swap-window retries")
  }

  test("readWhere pruning and registered views survive manifest graduation") {
    val base = tmpDir("graft-mt-prune-")
    deliver(base, 600)
    val mdir = s"$base/manifest"
    graft.sources.ZoneMaps.foldToParquet(spark, mdir) // zones tier
    ManifestReader.foldManifestToParquet(spark, mdir) // manifest tier
    val cut = graft.queries.Registry.tbl(spark, sfDir, "events")
      .orderBy("event_id").limit(600)
      .agg(expr("percentile_approx(ts, 0.9)")).head.getTimestamp(0)
    val pred = col("ts") >= lit(cut)
    val (kept, total) = ManifestReader.pruneStats(spark, mdir, pred)
    assert(kept > 0 && kept < total, s"double-tier pruning lost: $kept/$total")
    val a = ManifestReader.readWhere(spark, mdir, pred)
      .agg(count(lit(1)), sum(col("event_id"))).head
    val b = ManifestReader.read(spark, mdir).where(pred)
      .agg(count(lit(1)), sum(col("event_id"))).head
    assert(a == b)
    // registered view over the double-graduated lake still scans correctly
    graft.catalog.LakeCatalog.registerPrunedView(spark, "mt_prune_v", mdir)
    val viaSql = spark.sql(
      s"SELECT COUNT(*), SUM(event_id) FROM mt_prune_v WHERE ts >= TIMESTAMP '$cut'").head
    assert(viaSql == b, s"$viaSql vs $b")
  }
}
