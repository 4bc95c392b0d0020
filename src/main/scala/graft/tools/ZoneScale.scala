package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ZOrder
import graft.sources.ZoneMaps

/** Dev tool: measure zone-map skipping on a Z-order-clustered lineitem at
  * scale — files kept vs total and wall for a 2-D corner predicate, scanned
  * three ways: plain parquet scan of the unclustered table, full scan of
  * the clustered copy (row-group stats only), and the zone-map-pruned scan
  * (file skipping before listing). Not part of the driver contract.
  *
  * Usage: runMain graft.tools.ZoneScale <sfDir> [nFiles] [runs]
  */
object ZoneScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nFiles = if (args.length > 1) args(1).toInt else 64
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("graft-zonescale-").toString

    // SPARK_GRAFT_SIDECAR_ONLY=1 runs just the synthetic sidecar tier
    // (scaling-curve runs at several nUrls without re-paying the cluster/
    // deliver tiers); SPARK_GRAFT_SIDECAR_URLS overrides its size
    val sidecarOnly = sys.env.get("SPARK_GRAFT_SIDECAR_ONLY").contains("1")
    if (!sidecarOnly) {
    val t0 = System.nanoTime()
    ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), dir, nFiles)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val Array(maxPart, maxSupp) = li.agg(max("l_partkey"), max("l_suppkey"))
      .head.toSeq.map(_.asInstanceOf[Long] / 8).toArray
    val pred = col("l_partkey") <= maxPart && col("l_suppkey") <= maxSupp

    def time(body: => Long): (Double, Long) = {
      body // warm
      val rs = (1 to runs).map { _ =>
        val s = System.nanoTime(); val n = body
        ((System.nanoTime() - s) / 1e9, n)
      }
      (rs.map(_._1).sorted.apply(runs / 2), rs.head._2)
    }
    val (wPlain, nPlain) = time(li.where(pred).count())
    val clustered = spark.read.parquet(dir)
    val (wFull, nFull) = time(clustered.where(pred).count())
    val (wZone, nZone) = time(ZoneMaps.scanWhere(spark, dir, pred).count())
    val (kept, total) = ZoneMaps.pruneStats(spark, dir, pred)
    require(nPlain == nFull && nFull == nZone,
      s"row-count divergence: plain=$nPlain full=$nFull zone=$nZone")

    println(f"ZONESCALE sf=$sfDir rows=${li.count()} files=$total kept=$kept " +
      f"build=$buildSec%.2fs plain=$wPlain%.3fs clusteredFull=$wFull%.3fs " +
      f"zonePruned=$wZone%.3fs matchRows=$nZone")

    // bloom tier: find ONE record by key out of the whole table — the
    // reference's Athena point query. Keys are spread uniformly (worst
    // case for min/max), blooms isolate the file(s) holding the probe.
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id", "value")
    val bdir = java.nio.file.Files.createTempDirectory("graft-bloomscale-").toString
    val bFiles = math.max(nFiles * 4, 256)
    val tb = System.nanoTime()
    graft.streaming.Deliver.withInt64Timestamps(spark) {
      ev.repartition(bFiles, col("user_id")) // key-hash spread, NOT sorted
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#event_id", "true")
        .parquet(bdir)
    }
    val bloomBuild = (System.nanoTime() - tb) / 1e9
    val probeId = ev.orderBy(col("event_id")).select("event_id")
      .limit(1).head.getLong(0) + ev.count() / 2 // a mid-table key
    val bPred = col("event_id") === probeId
    val (wScan, nScan) = time(spark.read.parquet(bdir).where(bPred).count())
    val (wBloom, nBloom) = time(ZoneMaps.scanWhere(spark, bdir, bPred, blooms = true).count())
    val (bKept, bTotal) = ZoneMaps.pruneStats(spark, bdir, bPred, blooms = true)
    require(nScan == nBloom, s"bloom divergence: $nScan vs $nBloom")
    println(f"BLOOMSCALE sf=$sfDir rows=${ev.count()} files=$bTotal kept=$bKept " +
      f"build=$bloomBuild%.2fs fullScan=$wScan%.3fs bloomPruned=$wBloom%.3fs " +
      f"matchRows=$nBloom")

    // steady-state tier: a DELIVERED lake with the persisted `_zonemaps`
    // sidecar — what readWhere costs per query once the stats exist,
    // vs the manifest full scan (the sidecar read replaces the per-query
    // footer harvest the standalone scanWhere pays above)
    if (new java.io.File(s"$sfDir/events.parquet").exists()) {
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.types._
      val payloadSchema = StructType(Seq(
        StructField("data", StructType(Seq(
          StructField("id", LongType), StructField("status", StringType),
          StructField("value", DoubleType), StructField("ts", TimestampType),
          StructField("event_id", LongType)))),
        StructField("metadata", StructType(Seq(StructField("op", StringType))))))
      val base = java.nio.file.Files.createTempDirectory("graft-zonelake-").toString
      val evRaw = graft.queries.Registry.tbl(spark, sfDir, "events")
      graft.sources.ShardedLog.put(
        graft.sources.ShardedLog.fromEvents(evRaw), s"$base/log")
      val tDel = System.nanoTime()
      val qd = graft.streaming.Deliver.start(
        graft.sources.ShardedLog.readStream(spark, s"$base/log"), payloadSchema,
        graft.streaming.Deliver.Config(s"$base/lake", s"$base/ck",
          manifestDir = Some(s"$base/manifest"),
          zoneMapCols = Seq("ts", "event_id"),
          bloomFilterCols = Seq("id"),
          trigger = Trigger.AvailableNow(),
          clock = Some(java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13"))))
      qd.awaitTermination()
      val deliverSec = (System.nanoTime() - tDel) / 1e9
      val cutTs = java.sql.Timestamp.valueOf("2024-01-28 00:00:00")
      val tsPred = col("ts") >= lit(cutTs)
      val (wFullM, nFullM) = time(
        graft.sources.ManifestReader.read(spark, s"$base/manifest")
          .where(tsPred).count())
      val (wZoneM, nZoneM) = time(
        graft.sources.ManifestReader.readWhere(spark, s"$base/manifest", tsPred)
          .count())
      val (mKept, mTotal) = graft.sources.ManifestReader
        .pruneStats(spark, s"$base/manifest", tsPred)
      require(nFullM == nZoneM, s"readWhere divergence: $nFullM vs $nZoneM")
      println(f"LAKESCALE sf=$sfDir files=$mTotal kept=$mKept " +
        f"deliver=$deliverSec%.1fs manifestFull=$wFullM%.3fs " +
        f"readWhere=$wZoneM%.3fs matchRows=$nZoneM")

      // parquet-tier readWhere on the SAME lake: graduate the sidecar and
      // re-measure — the prune verdict now runs as a Spark job, parity
      // asserted against the JSON-tier rows
      graft.sources.ZoneMaps.foldToParquet(spark, s"$base/manifest")
      val (wZonePq, nZonePq) = time(
        graft.sources.ManifestReader.readWhere(spark, s"$base/manifest", tsPred)
          .count())
      val (pKept, pTotal) = graft.sources.ManifestReader
        .pruneStats(spark, s"$base/manifest", tsPred)
      require(nZonePq == nZoneM, s"pq-tier divergence: $nZonePq vs $nZoneM")
      require((pKept, pTotal) == (mKept, mTotal),
        s"pq-tier prune drift: $pKept/$pTotal vs $mKept/$mTotal")
      println(f"LAKESCALE_PQ sf=$sfDir files=$pTotal kept=$pKept " +
        f"readWherePq=$wZonePq%.3fs matchRows=$nZonePq")

      // bloom point probe at the FULL lake's file count: above the
      // distributeOver threshold (2048 < 2880) the footer+bloom probes run
      // as a Spark job — the prune decision off the driver hot path
      // (r11 verdict ask #7)
      val probeUser = evRaw.orderBy(col("event_id")).select("user_id")
        .head.getLong(0)
      val bloomPred = col("id") === probeUser
      val (wBloomL, nBloomL) = time(
        graft.sources.ManifestReader.readWhere(spark, s"$base/manifest",
          bloomPred, blooms = true).count())
      val (bKeptL, bTotalL) = graft.sources.ManifestReader
        .pruneStats(spark, s"$base/manifest", bloomPred, blooms = true)
      val (wPlainL, nPlainL) = time(
        graft.sources.ManifestReader.read(spark, s"$base/manifest")
          .where(bloomPred).count())
      require(nBloomL == nPlainL, s"lake bloom divergence: $nBloomL vs $nPlainL")
      println(f"LAKEBLOOM sf=$sfDir files=$bTotalL kept=$bKeptL " +
        f"fullScan=$wPlainL%.3fs bloomPruned=$wBloomL%.3fs matchRows=$nBloomL " +
        f"(distributed probe path: ${bTotalL > 2048})")
    }
    } // !sidecarOnly

    // SIDECAR scale tier (r12): a synthetic sidecar of `nFiles*16` urls ×
    // 3 columns — big enough that the JSON tier's whole-chain driver parse
    // is visibly the wrong shape — measuring load/prune wall and driver
    // heap for the JSON driver map vs the parquet tier's distributed
    // verdict, with the kept-set pinned identical.
    locally {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, Literal}
      import org.apache.spark.sql.types.TimestampType
      import graft.sources.ZoneMaps.ColZone
      val nUrls = sys.env.get("SPARK_GRAFT_SIDECAR_URLS").map(_.toInt)
        .getOrElse(math.max(nFiles * 16, 50000))
      val mdir = java.nio.file.Files.createTempDirectory("graft-sidecar-scale-")
        .toString
      val hconf = spark.sessionState.newHadoopConf()
      val status = "ok".getBytes("UTF-8")
      val zones: graft.sources.ZoneMaps.FileZones = (0 until nUrls).map { i =>
        val url = f"file:///fake/lake/day=${i / 2880}/part-$i%07d.parquet"
        url -> Map(
          "ts" -> ColZone("micros", Some(i * 1000000L), Some(i * 1000000L + 999999L),
            Some(0L), 1000L),
          "event_id" -> ColZone("long", Some(i * 100L), Some(i * 100L + 99L),
            Some(0L), 1000L),
          "status" -> ColZone("bytes", Some(status), Some(status), Some(0L), 1000L))
      }.toMap
      graft.sources.ZoneMaps.write(hconf, mdir, 0L, zones, compactEvery = 0)
      val cut = (nUrls - nUrls / 100).toLong * 1000000L // keep ~1% of files
      val pred = GreaterThanOrEqual(UnresolvedAttribute("ts"),
        Literal(cut, TimestampType))
      val urls = zones.keySet.toSeq.sorted
      def heapMb(): Long = {
        System.gc()
        (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
      }
      val h0 = heapMb()
      val tJson = System.nanoTime()
      val keptJson = (1 to runs).map { _ =>
        graft.operators.IndexMeta.invalidateAll() // force a cold load per run
        graft.sources.ZoneMaps.pruneResolved(spark, mdir, pred, urls)
      }.last
      val wJson = (System.nanoTime() - tJson) / 1e9 / runs
      val h1 = heapMb()
      graft.sources.ZoneMaps.foldToParquet(spark, mdir)
      val tPq = System.nanoTime()
      val keptPq = (1 to runs).map { _ =>
        graft.operators.IndexMeta.invalidateAll()
        graft.sources.ZoneMaps.pruneResolved(spark, mdir, pred, urls)
      }.last
      val wPq = (System.nanoTime() - tPq) / 1e9 / runs
      val h2 = heapMb()
      require(keptPq.sorted == keptJson.sorted,
        s"tier divergence: json kept ${keptJson.size} vs pq kept ${keptPq.size}")
      println(f"SIDECARSCALE urls=$nUrls entries=${nUrls * 3} kept=${keptPq.size} " +
        f"jsonPrune=$wJson%.3fs pqPrune=$wPq%.3fs " +
        f"heapMb base=$h0 afterJson=$h1 afterPq=$h2")

      // MANIFEST tier at the same url count (r13): the JSON chain's
      // per-read driver parse+collect+sort vs the parquet manifest tier's
      // signature-cached resolve, plus the >cap pruneResolved path where
      // the candidate restriction semi-joins the manifest TABLE instead of
      // broadcasting a driver list. Chain shape: one snapshot + 10
      // incrementals (the steady-state cadence window).
      val incSlice = nUrls / 100
      graft.streaming.ManifestChain // (type reference for clarity)
      def renderManifest(us: Seq[String]): String =
        us.map(u => s"""{"url": "$u", "mandatory": true}""")
          .mkString("""{"basePath": "file:///fake/lake", "entries": [""", ",", "]}")
      val mfs = new org.apache.hadoop.fs.Path(mdir).getFileSystem(hconf)
      graft.streaming.FsOps.atomicWrite(hconf, mfs,
        new org.apache.hadoop.fs.Path(mdir, "manifest-0000000000.snap.json"),
        renderManifest(urls.dropRight(10 * incSlice)).getBytes("UTF-8"))
      (0 until 10).foreach { i =>
        val slice = urls.slice(urls.size - (10 - i) * incSlice,
          urls.size - (9 - i) * incSlice)
        graft.streaming.FsOps.atomicWrite(hconf, mfs,
          new org.apache.hadoop.fs.Path(mdir, f"manifest-${i + 1}%010d.json"),
          renderManifest(slice).getBytes("UTF-8"))
      }
      val tJsonMf = System.nanoTime()
      val jsonUrls = (1 to runs).map { _ =>
        graft.operators.IndexMeta.invalidateAll()
        graft.sources.ManifestReader.latestManifestFiles(spark, mdir)
      }.last
      val wJsonMf = (System.nanoTime() - tJsonMf) / 1e9 / runs
      val hJsonMf = heapMb()
      val tFold = System.nanoTime()
      graft.sources.ManifestReader.foldManifestToParquet(spark, mdir)
      val wFold = (System.nanoTime() - tFold) / 1e9
      graft.operators.IndexMeta.invalidateAll()
      val tColdMf = System.nanoTime()
      val pqUrls = graft.sources.ManifestReader.latestManifestFiles(spark, mdir)
      val wColdMf = (System.nanoTime() - tColdMf) / 1e9
      val tWarmMf = System.nanoTime()
      val warm = (1 to runs).map(_ =>
        graft.sources.ManifestReader.latestManifestFiles(spark, mdir)).last
      val wWarmMf = (System.nanoTime() - tWarmMf) / 1e9 / runs
      val hPqMf = heapMb()
      // the parquet tier stores CANONICAL urls (Path-normalized: file:///
      // becomes file:/) — same files, canonical spelling; compare normalized
      def normAll(us: Seq[String]) =
        us.map(u => new org.apache.hadoop.fs.Path(u).toString).sorted
      require(normAll(pqUrls) == normAll(jsonUrls) && warm == pqUrls,
        s"manifest tier divergence: json ${jsonUrls.size} vs pq ${pqUrls.size}")
      // >cap candidate restriction through the manifest TABLE (urls.size >
      // 200k when nUrls is): kept set must match the unrestricted verdict
      val keptMf = graft.sources.ZoneMaps.pruneResolved(spark, mdir, pred, urls)
      require(keptMf.sorted == keptPq.sorted,
        s"manifest-table prune divergence: ${keptMf.size} vs ${keptPq.size}")
      println(f"MANIFESTSCALE urls=$nUrls jsonResolve=$wJsonMf%.3fs " +
        f"fold=$wFold%.3fs pqColdResolve=$wColdMf%.3fs pqCachedResolve=$wWarmMf%.4fs " +
        f"prunedViaTable=${urls.size - keptMf.size} " +
        f"heapMb afterJson=$hJsonMf afterPq=$hPqMf")
    }
    spark.stop()
  }
}
