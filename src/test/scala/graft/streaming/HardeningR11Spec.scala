package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.{PqIndex, Similarity}

/** Round-11 hardening, closing the r10 ADVICE findings:
  *
  *  1. A LOST lease (heartbeat CAS failed — another writer took over) is
  *     surfaced to the body, not just logged: the body's thread is
  *     interrupted, `Lease.lost` flips, and a body that ran to completion
  *     under a lapsed lease FAILS instead of returning success while a
  *     second writer mutates the lake.
  *  2. A minimum-lease floor: below it the heartbeat interval can exceed
  *     the lease and a live holder's lock expires between beats.
  *  3. IVF/PQ rebuild delete-first: an in-place rebuild removes the old
  *     index data BEFORE the new geometry lands, so a crash mid-rebuild
  *     can never leave new geometry certifying stale data.
  *  4. A failed shardScatter cancels the still-running shard tasks
  *     (shutdownNow) instead of leaking their Spark jobs.
  *  5. The sharded PQ serve warns loudly on a pre-geometry index instead
  *     of silently skipping dim validation.
  */
class HardeningR11Spec extends SparkSuite {

  private def fs = new HPath("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("lost lease: a body completing under a lapsed lease fails; Lease.lost flips") {
    val store = new InMemoryConditionalStore
    val lock = new ConditionalPutLockProvider(store)
    val lake = new HPath(tmpDir("graft-lost-"))
    val key = s"$lake/.graft-maintenance-lock"
    val sawLost = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ex = intercept[IllegalStateException] {
      lock.withLease(fs, lake, leaseMs = 300) { lease =>
        // simulate the takeover a GC pause causes: another writer CAS-steals
        // the key out from under the holder, so the next heartbeat fails
        val (_, ver) = store.get(key).get
        assert(store.putIfMatch(key, "thief:9999999999999".getBytes("UTF-8"), ver).isDefined)
        // wait (interrupt-tolerant) for the heartbeat to detect the loss
        val deadline = System.currentTimeMillis() + 5000
        while (!lease.lost && System.currentTimeMillis() < deadline)
          try Thread.sleep(20) catch { case _: InterruptedException => () }
        sawLost.set(lease.lost)
        // the body "completes" — withLock/withLease must still FAIL it
        lease.ensureHeld()
      }
    }
    assert(sawLost.get(), "Lease.lost never flipped after the takeover")
    assert(ex.getMessage.contains("LOST"), ex.getMessage)
    // the thief's lock survives the loser's release (deleteIfMatch no-ops)
    assert(store.get(key).isDefined, "release must not delete the new owner's lock")
  }

  test("lost lease: a BLOCKING body is interrupted, not left running to completion") {
    val store = new InMemoryConditionalStore
    val lock = new ConditionalPutLockProvider(store)
    val lake = new HPath(tmpDir("graft-lostint-"))
    val key = s"$lake/.graft-maintenance-lock"
    val interrupted = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[Exception] {
      lock.withLock(fs, lake, leaseMs = 300) {
        val (_, ver) = store.get(key).get
        store.putIfMatch(key, "thief:9999999999999".getBytes("UTF-8"), ver)
        // a long blocking section — the heartbeat's owner-interrupt must
        // abort it well before the 30 s sleep ends
        try Thread.sleep(30000)
        catch { case e: InterruptedException => interrupted.set(true); throw e }
      }
    }
    assert(interrupted.get(), "blocking body was not interrupted on lease loss")
  }

  test("lease floor: a lease shorter than the heartbeat can sustain is refused") {
    val lock = new ConditionalPutLockProvider(new InMemoryConditionalStore)
    val ex = intercept[IllegalArgumentException] {
      lock.withLock(fs, new HPath(tmpDir("graft-floor-")), leaseMs = 100) { fail("must not run") }
    }
    assert(ex.getMessage.contains("floor"), ex.getMessage)
  }

  test("IVF rebuild into a non-empty indexDir leaves no stale cells behind") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding"))
    val dir = s"${tmpDir("graft-rebuild-")}/index"
    Similarity.buildIvfIndex(corpus, dir, nlist = 8)
    assert(Similarity.readIvfGeometry(spark, dir).contains((64, 8, "cosine")))
    // rebuild IN PLACE with different geometry (nlist 8 → 2)
    Similarity.buildIvfIndex(corpus, dir, nlist = 2)
    assert(Similarity.readIvfGeometry(spark, dir).contains((64, 2, "cosine")))
    // the corpus layout matches the NEW geometry only — no stale cell dirs
    val cellDirs = new java.io.File(s"$dir/corpus").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.subsetOf(Set("cell=0", "cell=1")), s"stale cells survive: $cellDirs")
    assert(spark.read.parquet(s"$dir/centroids").count() == 2)
    // and the rebuilt index serves
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    assert(Similarity.ivfIndexQuery(queries, dir, k = 3, nprobe = 1).count() == 9)
  }

  test("PQ rebuild deletes the old codebooks before writing new data") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding"))
    val dir = s"${tmpDir("graft-pqrebuild-")}/index"
    PqIndex.buildPqIvfIndex(corpus, dir, dim = 64, nlist = 4, m = 8, ksub = 16)
    assert(spark.read.parquet(s"$dir/codebooks").head().getAs[Int]("nlist") == 4)
    PqIndex.buildPqIvfIndex(corpus, dir, dim = 64, nlist = 2, m = 4, ksub = 16)
    val meta = spark.read.parquet(s"$dir/codebooks").head()
    assert(meta.getAs[Int]("nlist") == 2 && meta.getAs[Int]("m") == 4)
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.subsetOf(Set("cell=0", "cell=1")), s"stale cells survive: $cellDirs")
  }

  test("a failed shardScatter cancels the other shards' still-running work") {
    val started = new java.util.concurrent.CountDownLatch(1)
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ex = intercept[RuntimeException] {
      Similarity.shardScatter(2) { sh =>
        if (sh == 1) {
          // fail only after the slow shard is definitely running
          started.await()
          throw new RuntimeException("shard 1 boom")
        } else {
          started.countDown()
          try Thread.sleep(30000)
          catch { case _: InterruptedException => cancelled.set(true) }
          "slow"
        }
      }
    }
    assert(ex.getMessage == "shard 1 boom")
    // shutdownNow interrupts the slow shard promptly — it must not run
    // its full 30 s after the scatter already failed
    val deadline = System.currentTimeMillis() + 5000
    while (!cancelled.get() && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(cancelled.get(), "slow shard kept running after scatter failure")
  }

  test("sharded PQ serve warns loudly when the index predates the dim column") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val dir = s"${tmpDir("graft-pqpre-")}/index"
    PqIndex.buildPqIvfIndexSharded(corpus, dir, nShards = 2, dim = 64,
      nlist = 2, m = 8, ksub = 16)
    // strip dim/nlist from shard 0's codebooks row — the pre-r10 layout
    val meta = spark.read.parquet(s"$dir/shard=0/codebooks")
      .select("m", "ksub", "books", "band")
    val tmp = tmpDir("graft-pqpre-cb-")
    meta.coalesce(1).write.mode("overwrite").parquet(s"$tmp/cb")
    spark.read.parquet(s"$tmp/cb").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/shard=0/codebooks")
    val errBuf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
    try {
      val out = PqIndex.pqIvfQuerySharded(queries, dir, k = 3, nprobe = 1)
      assert(out.count() == 9)
    } finally System.setErr(realErr)
    assert(new String(errBuf.toByteArray, "UTF-8").contains("predates the dim"),
      "pre-geometry sharded index served without the loud warning")
  }
}
