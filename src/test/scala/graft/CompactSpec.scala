package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import graft.streaming.{Compact, ManifestChain}

/** Lake small-file compaction: bin-packing, content preservation, manifest
  * fold, and both crash-recovery directions of the two-phase swap.
  */
class CompactSpec extends SparkSuite {
  import spark.implicits._

  private def hfs(dir: String) =
    new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** A toy partitioned lake: 2 partitions × `filesPer` small files each. */
  private def buildLake(filesPer: Int): String = {
    val lake = tmpDir("graft-cpt-")
    Seq("a", "b").foreach { p =>
      (1 to 100).map(i => (i.toLong, s"$p-$i")).toDF("id", "v")
        .repartition(filesPer)
        .write.mode("overwrite").parquet(s"$lake/part=$p")
    }
    lake
  }

  private def snapshot(lake: String): Seq[(Long, String, String)] =
    spark.read.parquet(lake).select($"id", $"v", $"part")
      .as[(Long, String, String)].collect().sortBy(r => (r._3, r._1)).toSeq

  private def dataFileCount(lake: String): Int = {
    def walk(d: java.io.File): Seq[java.io.File] =
      d.listFiles().toSeq.filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
        .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    walk(new java.io.File(lake)).count(_.getName.endsWith(".parquet"))
  }

  test("bin-packs partitions, preserves content, folds the manifest") {
    val lake = buildLake(filesPer = 6)
    val mdir = tmpDir("graft-cptm-")
    // seed a manifest chain naming the original files (as Deliver would)
    val fs = hfs(lake)
    val origFiles = spark.read.parquet(lake).inputFiles.toSeq.sorted
    val entries = origFiles.map(f => s"""{"url": "$f", "mandatory": true}""")
      .mkString("[", ",", "]")
    graft.streaming.FsOps.atomicWrite(spark.sessionState.newHadoopConf(), hfs(mdir),
      new HPath(mdir, "manifest-0000000000.json"), s"""{"entries": $entries}""".getBytes("UTF-8"))

    val before = snapshot(lake)
    val stats = Compact.run(spark, lake, targetBytes = 1L << 30, manifestDir = Some(mdir))
    assert(stats.partitionsPacked == 2 && stats.filesBefore == 12 && stats.filesAfter == 2)
    assert(dataFileCount(lake) == 2, "each partition packs to one file")
    assert(snapshot(lake) == before, "compaction must not change a single row")
    // manifest now resolves to exactly the new files (URI-normalized:
    // inputFiles says file:///, makeQualified says file:/)
    def norm(u: String) = new HPath(u).toString
    val chain = ManifestChain.chainUrls(hfs(mdir), new HPath(mdir), Long.MaxValue)
      .map(norm).toSet
    val now = spark.read.parquet(lake).inputFiles.map(norm).toSet
    assert(chain == now, s"manifest chain $chain != lake files $now")
    assert(chain.intersect(origFiles.map(norm).toSet).isEmpty,
      "no old file survives in the chain")
    // second pass is a no-op
    assert(Compact.run(spark, lake, 1L << 30, Some(mdir)) == Compact.Stats(0, 0, 0))
  }

  test("already-packed partitions are left untouched") {
    val lake = buildLake(filesPer = 1)
    val before = spark.read.parquet(lake).inputFiles.toSet
    assert(Compact.run(spark, lake, 1L << 30) == Compact.Stats(0, 0, 0))
    assert(spark.read.parquet(lake).inputFiles.toSet == before)
  }

  test("crash before the commit point rolls BACK: originals intact, news gone") {
    val lake = buildLake(filesPer = 4)
    val fs = hfs(lake)
    val before = snapshot(lake)
    val origFiles = spark.read.parquet(lake).inputFiles.toSet
    // simulate a crash mid-promote: one new file landed, intent written,
    // no promoted marker
    val landed = new HPath(s"$lake/part=a/part-crashed-halfway.parquet")
    fs.create(landed, true).close()
    graft.streaming.FsOps.atomicWrite(spark.sessionState.newHadoopConf(), fs,
      new HPath(s"$lake/_compact/intent"),
      (s"N ${fs.makeQualified(landed)}\n" +
        origFiles.toSeq.sorted.map("O " + _).mkString("\n")).getBytes("UTF-8"))
    Compact.recover(spark, lake)
    assert(!fs.exists(landed), "half-promoted file must be rolled back")
    assert(snapshot(lake) == before, "originals untouched")
    assert(!fs.exists(new HPath(s"$lake/_compact/intent")), "intent cleared")
  }

  test("crash after the commit point rolls FORWARD: olds retired, manifest folded") {
    val lake = buildLake(filesPer = 4)
    val mdir = tmpDir("graft-cptm-")
    val fs = hfs(lake)
    val before = snapshot(lake)
    // run a real pass up to its commit point by replaying its own bookkeeping:
    // do the full run, then re-create the post-commit-pre-finish state
    val origA = spark.read.parquet(s"$lake/part=a").inputFiles.toSet
    // pack part=a by hand into one staged-then-promoted file
    val packed = new HPath(s"$lake/part=a/part-packed-by-test.parquet")
    spark.read.parquet(origA.toSeq: _*).coalesce(1)
      .write.mode("overwrite").parquet(s"$lake/_compact/tmp")
    val made = fs.listStatus(new HPath(s"$lake/_compact/tmp")).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    graft.streaming.FsOps.renameOrThrow(fs, made, packed)
    // the intent records the manifest dir; recovery is called WITHOUT it
    // (a standalone recover must fold the interrupted pass's own chain)
    graft.streaming.FsOps.atomicWrite(spark.sessionState.newHadoopConf(), fs,
      new HPath(s"$lake/_compact/intent"),
      (s"M $mdir\nN ${fs.makeQualified(packed)}\n" +
        origA.toSeq.sorted.map("O " + _).mkString("\n")).getBytes("UTF-8"))
    fs.create(new HPath(s"$lake/_compact/promoted"), true).close()
    Compact.recover(spark, lake)
    def norm(u: String) = new HPath(u).toString
    assert(spark.read.parquet(s"$lake/part=a").inputFiles.map(norm).toSet ==
      Set(norm(fs.makeQualified(packed).toString)), "olds retired, packed file serves")
    assert(snapshot(lake) == before, "content unchanged through roll-forward")
    val chain = ManifestChain.chainUrls(hfs(mdir), new HPath(mdir), Long.MaxValue)
    assert(chain == Seq(fs.makeQualified(packed).toString))
    assert(!fs.exists(new HPath(s"$lake/_compact/intent")))
    assert(!fs.exists(new HPath(s"$lake/_compact/promoted")))
  }

  test("sortBy compaction clusters files into disjoint sorted ranges (data skipping)") {
    val lake = tmpDir("graft-cpts-")
    // many small unsorted files; ids interleave across all of them
    (0 until 6).foreach { i =>
      (0 until 200).filter(_ % 6 == i).map(n => (n.toLong, s"v$n"))
        .toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(s"$lake/part=a")
    }
    // pack into ~2 files, clustered by id
    val total = new java.io.File(s"$lake/part=a").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    Compact.run(spark, lake, targetBytes = total / 2 + 1, sortBy = Seq("id"))

    val files = new java.io.File(s"$lake/part=a").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 2, s"expected ≥2 packed files, got ${files.length}")
    // per-file id ranges must be disjoint (range clustering) and each file
    // internally sorted — the layout parquet min/max skipping needs
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f).select($"id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"$f not internally sorted")
      (ids.min, ids.max)
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file ranges overlap: ${ranges.mkString(", ")}")
      case _ =>
    }
    // content is intact
    assert(spark.read.parquet(lake).count() == 200)
  }

  test("compacts an unpartitioned lake (data files at the root)") {
    val lake = tmpDir("graft-cpr-")
    (1 to 100).map(i => (i.toLong, s"r-$i")).toDF("id", "v")
      .repartition(5).write.mode("overwrite").parquet(lake)
    val before = spark.read.parquet(lake).select($"id", $"v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(Compact.run(spark, lake, 1L << 30) == Compact.Stats(1, 5, 1))
    assert(spark.read.parquet(lake).select($"id", $"v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq == before)
  }

  test("refuses a FileStreamSink lake (_spark_metadata)") {
    val lake = buildLake(filesPer = 2)
    hfs(lake).mkdirs(new HPath(s"$lake/_spark_metadata"))
    intercept[IllegalArgumentException] { Compact.run(spark, lake) }
  }

  test("a held writer lock fails every maintenance op fast; forceUnlock releases it") {
    import graft.streaming.{Backfill, Erase, Retention}
    val lake = buildLake(filesPer = 4)
    val fs = hfs(lake)
    fs.create(new HPath(s"$lake/_compact/lock"), false).close() // writer "crashed" holding it
    val ops: Seq[() => Any] = Seq(
      () => Compact.run(spark, lake),
      () => Compact.recover(spark, lake),
      () => Erase.eraseKeys(spark, lake, "id", Seq(1L).toDF("id")),
      () => Retention.sweep(spark, lake, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      () => Backfill.overwritePartitions(
        Seq((1L, "x", "a")).toDF("id", "v", "part"), lake, Seq("part")))
    ops.foreach { op =>
      val e = intercept[IllegalStateException] { op() }
      assert(e.getMessage.contains("maintenance writer"), e.getMessage)
    }
    val before = snapshot(lake)
    Compact.forceUnlock(spark, lake)
    assert(Compact.run(spark, lake).partitionsPacked == 2)
    assert(snapshot(lake) == before)
  }

  test("two racing maintenance writers: exactly one wins, the lake stays consistent") {
    val lake = buildLake(filesPer = 6)
    val before = snapshot(lake)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Compact.Stats]]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        barrier.await()
        try results.add(Right(Compact.run(spark, lake)))
        catch { case t: Throwable => results.add(Left(t)) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    val (losers, winners) = results.toArray(Array.empty[Either[Throwable, Compact.Stats]])
      .toSeq.partition(_.isLeft)
    // exactly one writer packs the lake; the other either lost the lock
    // race (fail-fast) or started after the winner finished and found
    // nothing left to pack — NEVER a second concurrent pack
    val packed = winners.collect { case Right(s) if s.partitionsPacked > 0 => s }
    assert(packed.size == 1, s"want exactly one packer, got $results")
    losers.foreach { case Left(t) =>
      assert(t.isInstanceOf[IllegalStateException] &&
        t.getMessage.contains("maintenance writer"), t.toString)
      case _ => ()
    }
    assert(snapshot(lake) == before, "racing writers must not lose or duplicate a row")
    assert(dataFileCount(lake) == 2)
    // the lock is released: a follow-up pass runs (and no-ops)
    assert(Compact.run(spark, lake) == Compact.Stats(0, 0, 0))
  }
}
