package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{Path => HPath}
import graft.SparkSuite

/** The conditional-PUT reference LockProvider (r10): proves the
  * [[LockProvider]] seam composes with a lock built on nothing but an
  * object store's create-if-absent + CAS primitives — the bare-S3 shape
  * [[FsLeaseLock]] cannot serve.
  */
class ConditionalPutLockSpec extends SparkSuite {
  import spark.implicits._

  private def fs = new HPath("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("mutual exclusion: held lease refuses; release allows reacquire") {
    val store = new InMemoryConditionalStore
    val lock = new ConditionalPutLockProvider(store)
    val lake = new HPath(tmpDir("graft-cput-"))
    var ran = 0
    lock.withLock(fs, lake, leaseMs = 60000) {
      ran += 1
      // a second contender while held fails fast and runs nothing
      val ex = intercept[IllegalStateException] {
        lock.withLock(fs, lake, leaseMs = 60000) { ran += 100 }
      }
      assert(ex.getMessage.contains("conditional-PUT"), ex.getMessage)
    }
    // released: the key is gone and a fresh acquire succeeds
    assert(store.get(s"$lake/.graft-maintenance-lock").isEmpty)
    lock.withLock(fs, lake, leaseMs = 60000) { ran += 10 }
    assert(ran == 11)
  }

  test("a dead writer's expired lease is taken over atomically; exactly one CAS racer wins") {
    val clock = new AtomicLong(1000000L)
    val store = new InMemoryConditionalStore
    val lock = new ConditionalPutLockProvider(store, () => clock.get())
    val lake = new HPath(tmpDir("graft-cput-stale-"))
    val key = s"$lake/.graft-maintenance-lock"
    // a dead writer's lock: expiry in the past, no heartbeat behind it
    store.putIfAbsent(key, s"dead-writer:${clock.get() - 1}".getBytes("UTF-8"))
    var ran = false
    lock.withLock(fs, lake, leaseMs = 60000) { ran = true }
    assert(ran, "expired lease must be taken over")
    // CAS race: two waiters read the same stale version; one putIfMatch
    // wins, the second fails against the changed version
    val v0 = store.putIfAbsent(key, s"dead:${clock.get() - 1}".getBytes("UTF-8")).get
    assert(store.putIfMatch(key, "a:9".getBytes, v0).isDefined)
    assert(store.putIfMatch(key, "b:9".getBytes, v0).isEmpty,
      "second CAS against the consumed version must lose")
    // a LIVE lease (future expiry) is never taken over
    val store2 = new InMemoryConditionalStore
    val lock2 = new ConditionalPutLockProvider(store2, () => clock.get())
    val lake2 = new HPath(tmpDir("graft-cput-live-"))
    store2.putIfAbsent(s"$lake2/.graft-maintenance-lock",
      s"alive:${clock.get() + 3600000}".getBytes("UTF-8"))
    intercept[IllegalStateException] {
      lock2.withLock(fs, lake2, leaseMs = 60000) { fail("must not run") }
    }
  }

  test("heartbeat CAS-extends the lease while the body runs") {
    val store = new InMemoryConditionalStore
    val lock = new ConditionalPutLockProvider(store)
    val lake = new HPath(tmpDir("graft-cput-beat-"))
    val key = s"$lake/.graft-maintenance-lock"
    // lease 900 ms, body 2.2 s: without heartbeats the lease expires
    // ~1.3 s before the body ends and the contender would take over
    lock.withLock(fs, lake, leaseMs = 900) {
      Thread.sleep(2200)
      val ex = intercept[IllegalStateException] {
        lock.withLock(fs, lake, leaseMs = 900) { fail("lease must be live") }
      }
      assert(ex.getMessage.contains("conditional-PUT"))
      // and the stored expiry is in the future (a heartbeat landed)
      val (bytes, _) = store.get(key).get
      val expiry = new String(bytes, "UTF-8").split(':').last.toLong
      assert(expiry > System.currentTimeMillis(),
        s"expiry $expiry not extended past now")
    }
    assert(store.get(key).isEmpty, "release must delete the holder's lock")
  }

  test("the seam composes: a contended conditional-PUT lock blocks maintenance, lake untouched") {
    val store = new InMemoryConditionalStore
    val lock = new ConditionalPutLockProvider(store)
    val base = tmpDir("graft-cput-seam-")
    Seq((1L, "a", 1), (2L, "b", 2)).toDF("id", "v", "day")
      .write.partitionBy("day").parquet(s"$base/lake")
    // someone else holds the lake's lock in the external store
    store.putIfAbsent(s"$base/lake/.graft-maintenance-lock",
      s"other:${System.currentTimeMillis() + 3600000}".getBytes("UTF-8"))
    val before = spark.read.parquet(s"$base/lake")
      .select($"id", $"v").as[(Long, String)].collect().toSet
    intercept[IllegalStateException] {
      Backfill.overwritePartitions(Seq((2L, "B2", 2)).toDF("id", "v", "day"),
        s"$base/lake", Seq("day"), lock = lock)
    }
    assert(spark.read.parquet(s"$base/lake")
      .select($"id", $"v").as[(Long, String)].collect().toSet == before)
    // the same provider with a free store key runs the op
    val free = new ConditionalPutLockProvider(new InMemoryConditionalStore)
    Backfill.overwritePartitions(Seq((2L, "B2", 2)).toDF("id", "v", "day"),
      s"$base/lake", Seq("day"), lock = free)
    assert(spark.read.parquet(s"$base/lake")
      .select($"id", $"v").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B2")))
  }

  test("tryWithLock: contention → None (body unrun), body errors PROPAGATE") {
    // r13 verdict ask #5: the inherited probe-then-reacquire default made a
    // writer arriving between the two acquires THROW out of a method whose
    // contract is "skipping must always be safe" (the deliver sink's
    // opportunistic self-fold would fail its micro-batch). The override
    // maps exactly this provider's refuse signal to None.
    val store = new InMemoryConditionalStore
    val lock = new ConditionalPutLockProvider(store)
    val lake = new HPath(tmpDir("graft-cput-try-"))
    val key = s"$lake/.graft-maintenance-lock"
    // contention: a live lease held elsewhere → None, body never runs
    store.putIfAbsent(key,
      s"other:${System.currentTimeMillis() + 3600000}".getBytes("UTF-8"))
    assert(lock.tryWithLock(fs, lake, 60000) { fail("body must not run") }.isEmpty)
    // free: runs under the lease and releases
    val (bytes, ver) = store.get(key).get
    assert(store.deleteIfMatch(key, ver), s"fixture release failed: ${new String(bytes)}")
    assert(lock.tryWithLock(fs, lake, 60000) { 42 }.contains(42))
    assert(store.get(key).isEmpty, "tryWithLock must release on completion")
    // a body error is NOT contention — it must propagate, and release
    val ex = intercept[RuntimeException] {
      lock.tryWithLock(fs, lake, 60000) { throw new RuntimeException("body boom") }
    }
    assert(ex.getMessage == "body boom")
    assert(store.get(key).isEmpty, "tryWithLock must release on body failure")
  }
}
