package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrderFunctions
import graft.operators.ZOrder
import graft.sources.ZoneMaps

/** Z-order clustering: interleave correctness against a reference
  * implementation, order preservation of the string proxy, and the actual
  * payoff — multi-column file pruning on a clustered rewrite.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("interleave_bits matches a reference Morton encode (codegen + interpreted)") {
    def reference(xs: Seq[Int], bits: Int): Long = {
      var z = 0L
      val n = xs.size
      for (b <- 0 until bits; c <- 0 until n)
        z |= ((xs(c).toLong >> b) & 1L) << (b * n + (n - 1 - c))
      z
    }
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 12), rnd.nextInt(1 << 12)))
    val got = rows.toDF("a", "b")
      .select(ZOrderFunctions.interleaveBits(array(col("a"), col("b")), 12, 2).as("z"))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (a, b) => reference(Seq(a, b), 12) })

    // 2-D locality sanity: the high bit of either column dominates equally
    val hiA = reference(Seq(1 << 11, 0), 12)
    val hiB = reference(Seq(0, 1 << 11), 12)
    assert(hiA == (1L << 23) && hiB == (1L << 22))
  }

  test("string prefix proxy preserves byte order and fits a double exactly") {
    val ss = Seq("", "a", "añejo", "apple", "applesauce", "pear", "zz", "ÿÿ")
    val prox = ss.map(s => ZOrderFunctions.StringPrefixLong.prefix(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    // byte-order parity on every pair
    for (i <- ss.indices; j <- ss.indices) {
      val bytesCmp = ZoneMaps.cmp(ss(i).getBytes("UTF-8").take(6),
        ss(j).getBytes("UTF-8").take(6))
      assert(Integer.signum(java.lang.Long.compare(prox(i), prox(j))) ==
        Integer.signum(bytesCmp), s"order broke on '${ss(i)}' vs '${ss(j)}'")
    }
    // 48-bit payload survives the double domain losslessly
    prox.foreach(p => assert(p.toDouble.toLong == p && p >= 0))
  }

  test("cluster: scan parity and pruning on BOTH clustered columns") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val dir = tmpDir("graft-zorder-")
    ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), dir, nFiles = 16)

    val zScan = spark.read.parquet(dir)
    assert(zScan.count() == li.count(), "clustering must not drop rows")

    val maxPart = li.agg(max("l_partkey")).head.getLong(0)
    val maxSupp = li.agg(max("l_suppkey")).head.getLong(0)
    def parityAndPrune(pred: org.apache.spark.sql.Column): Int = {
      val viaZones = ZoneMaps.scanWhere(spark, dir, pred)
        .agg(sum("l_quantity")).head.getDouble(0)
      val full = zScan.where(pred).agg(sum("l_quantity")).head.getDouble(0)
      assert(viaZones == full, s"z-scan diverged under $pred")
      ZoneMaps.pruneStats(spark, dir, pred)._1
    }
    // a ~1/8 range on EITHER dimension prunes at least half the 16 files
    // (1-D sorted layout would prune on the sort key only)
    val kPart = parityAndPrune(col("l_partkey") <= maxPart / 8)
    val kSupp = parityAndPrune(col("l_suppkey") <= maxSupp / 8)
    assert(kPart <= 8, s"partkey slab kept $kPart of 16 files")
    assert(kSupp <= 8, s"suppkey slab kept $kSupp of 16 files")
    // and a 2-D cell keeps strictly fewer than either slab alone
    val kBoth = parityAndPrune(
      col("l_partkey") <= maxPart / 8 && col("l_suppkey") <= maxSupp / 8)
    assert(kBoth <= math.min(kPart, kSupp))
  }

  test("the z-value projection stays inside WholeStageCodegen (no fallback)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val df = li.select(ZOrder.zValue(li, Seq("l_partkey", "l_suppkey")).as("z"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("interleave_bits"),
      s"expected the interleave/bucket projection inside a codegen stage:\n$plan")
  }

  test("compact with zorderBy rewrites the lake and repairs the zone-map sidecar") {
    import org.apache.hadoop.fs.{Path => HPath}
    import graft.streaming.{Compact, FsOps, ManifestChain}
    val base = tmpDir("graft-zcompact-")
    val lake = s"$base/lake"
    val mdir = s"$base/manifest"
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new HPath(base).getFileSystem(hconf)
    // 6 small files, each spanning the FULL k/v range (the worst pre-compact
    // layout: no predicate can prune anything)
    val rnd = new scala.util.Random(11)
    (0 until 6).foreach { i =>
      Seq.fill(400)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
        .toDF("k", "v").coalesce(1)
        .write.mode("append").parquet(lake)
    }
    val files = FsOps.walkParquet(fs, new HPath(lake), skipHidden = true)
      .map(p => fs.makeQualified(p).toString).sorted
    assert(files.size == 6)
    FsOps.atomicWrite(hconf, fs, new HPath(mdir, "manifest-0000000001.json"),
      ManifestChain.render(files,
        Some(fs.makeQualified(new HPath(lake)).toString)).getBytes("UTF-8"))
    ZoneMaps.write(hconf, mdir, 1L,
      ZoneMaps.fromFooters(hconf, files, Seq("k", "v")), 10)

    import graft.sources.ManifestReader
    val pred = col("k") < 120L && col("v") < 120L
    val expected = ManifestReader.read(spark, mdir).where(pred).count()
    // full-range files: zone maps can prove nothing
    assert(ManifestReader.pruneStats(spark, mdir, pred)._1 == 6)

    val bytes = files.map(f => fs.getFileStatus(new HPath(f)).getLen).sum
    val stats = Compact.run(spark, lake, targetBytes = bytes / 4,
      manifestDir = Some(mdir), zorderBy = Seq("k", "v"))
    assert(stats.partitionsPacked == 1 && stats.filesBefore == 6)
    assert(stats.filesAfter >= 3, s"wanted multiple z-files, got ${stats.filesAfter}")

    // parity survived the rewrite, and the REPAIRED sidecar prunes now
    assert(ManifestReader.readWhere(spark, mdir, pred).count() == expected)
    val (kept, total) = ManifestReader.pruneStats(spark, mdir, pred)
    assert(total == stats.filesAfter)
    assert(kept < total, s"z-compacted lake should prune under $pred ($kept/$total)")
  }

  test("nulls cluster at z-min and survive; unsupported types refuse loudly") {
    val df = Seq((Some(5L), "x"), (None, "y"), (Some(1L), "z"))
      .toDF("k", "s")
    val dir = tmpDir("graft-zorder-null-")
    ZOrder.cluster(df, Seq("k", "s"), dir, nFiles = 2)
    assert(spark.read.parquet(dir).count() == 3)
    assert(spark.read.parquet(dir).where(col("k").isNull).count() == 1)

    val bad = Seq((1L, Array(1.0))).toDF("k", "emb")
    val e = intercept[IllegalArgumentException] {
      ZOrder.zValue(bad, Seq("emb"))
    }
    assert(e.getMessage.contains("no order-preserving double proxy"))
  }
}
