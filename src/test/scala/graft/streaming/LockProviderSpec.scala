package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import graft.SparkSuite

/** The maintenance lock is a SEAM (r9, adopter-risk #3): the default
  * FsLeaseLock's create-if-absent/rename atomicity holds on HDFS/local
  * filesystems but not on bare S3, so every maintenance entry point
  * (Compact/Backfill/Erase/Retention/recover) takes a LockProvider and an
  * object-store deployment swaps in an external lock service with one
  * argument. This spec pins the seam's contract:
  *
  *  - every entry point actually routes through the provided lock (no
  *    hidden FsLeaseLock fallback on any path);
  *  - a provider that refuses prevents the op from mutating the lake at
  *    all — the lock is checked before any plan/stage/intent work.
  */
class LockProviderSpec extends SparkSuite {
  import spark.implicits._

  /** Counts acquisitions, then delegates to the default provider. */
  private final class Counting extends LockProvider {
    val acquired = new AtomicInteger(0)
    def withLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(body: => T): T = {
      acquired.incrementAndGet()
      FsLeaseLock.withLock(fs, lake, leaseMs)(body)
    }
  }

  /** Always refuses, as an external lock service under contention would. */
  private object Refusing extends LockProvider {
    def withLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(body: => T): T =
      throw new IllegalStateException("lease held elsewhere (injected)")
  }

  private def writeLake(base: String): Unit =
    Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2))
      .toDF("id", "v", "day")
      .write.partitionBy("day").parquet(s"$base/lake")

  private def lakeState(base: String): Set[(Long, String)] =
    spark.read.parquet(s"$base/lake")
      .select($"id", $"v").as[(Long, String)].collect().toSet

  test("every maintenance entry point routes through the provided lock") {
    val base = tmpDir("graft-lockseam-")
    writeLake(base)
    val lock = new Counting
    Compact.run(spark, s"$base/lake", lock = lock)
    Backfill.overwritePartitions(Seq((3L, "C2", 2)).toDF("id", "v", "day"),
      s"$base/lake", Seq("day"), lock = lock)
    Erase.eraseKeys(spark, s"$base/lake", "id", Seq(1L).toDF("id"), lock = lock)
    Compact.recover(spark, s"$base/lake", lock = lock)
    assert(lock.acquired.get == 4,
      s"expected 4 locked passes, saw ${lock.acquired.get}")
    // the tombstone self-fold (ErasedKeys.foldIfQuiet, r14) must ride the
    // SAME seam — an unlocked fold racing a locked maintenance pass could
    // delete set files its probe just listed. Its cheap pre-check only
    // locks once >= 2 sets exist, so a SECOND erase pins it: one acquire
    // for the erase itself + one for the fold.
    Erase.eraseKeys(spark, s"$base/lake", "id", Seq(2L).toDF("id"), lock = lock)
    assert(lock.acquired.get == 6,
      s"expected 6 locked passes (5 ops + the 2nd erase's tombstone fold), " +
        s"saw ${lock.acquired.get}")
    assert(lakeState(base) == Set((3L, "C2")))
    // Retention needs the hour layout; count its acquisition separately
    val base2 = tmpDir("graft-lockseam-ret-")
    Seq((1L, 2024, 1, 1, 0), (2L, 2024, 1, 2, 0))
      .toDF("id", "year", "month", "day", "hour")
      .write.partitionBy("year", "month", "day", "hour").parquet(s"$base2/lake")
    val lock2 = new Counting
    Retention.sweep(spark, s"$base2/lake",
      java.time.LocalDateTime.of(2024, 1, 2, 0, 0), None, lock = lock2)
    assert(lock2.acquired.get == 1)
    assert(spark.read.parquet(s"$base2/lake").count() == 1)
  }

  test("a refusing provider blocks the op before any lake mutation") {
    val base = tmpDir("graft-lockseam-ref-")
    writeLake(base)
    val before = lakeState(base)
    intercept[IllegalStateException] {
      Backfill.overwritePartitions(Seq((3L, "C2", 2)).toDF("id", "v", "day"),
        s"$base/lake", Seq("day"), lock = Refusing)
    }
    intercept[IllegalStateException] {
      Erase.eraseKeys(spark, s"$base/lake", "id", Seq(1L).toDF("id"),
        lock = Refusing)
    }
    intercept[IllegalStateException] {
      Compact.run(spark, s"$base/lake", lock = Refusing)
    }
    assert(lakeState(base) == before, "a refused op must not touch the lake")
    // and no control files may have been left behind
    assert(!new java.io.File(s"$base/lake/_compact/intent").exists())
    assert(!new java.io.File(s"$base/lake/_compact/stage").exists())
  }

  test("default tryWithLock: ONE acquire, contention → None, never throws") {
    val lake = new HPath(tmpDir("graft-trylock-"))
    val hfs = lake.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a bare provider (withLock only) under contention: the old
    // probe-then-reacquire default could THROW out of tryWithLock when a
    // writer arrived between its two acquires; the single-delegate default
    // maps any failure to None
    assert(Refusing.tryWithLock(hfs, lake, 60000) { fail("body must not run") } .isEmpty)
    // exactly one acquisition per try — the probe acquire (which
    // transiently HELD the real lock and could spuriously fail a
    // concurrent locked pass) is gone
    val counting = new Counting
    assert(counting.tryWithLock(hfs, lake, 60000) { 42 }.contains(42))
    assert(counting.acquired.get == 1,
      s"default tryWithLock must acquire exactly once, saw ${counting.acquired.get}")
    // a bare provider's body error maps to None (documented swallow: the
    // default cannot tell it from contention) — and the lock is RELEASED,
    // so the next acquire succeeds
    assert(counting.tryWithLock(hfs, lake, 60000) {
      throw new RuntimeException("body boom")
    }.isEmpty)
    assert(counting.tryWithLock(hfs, lake, 60000) { 7 }.contains(7),
      "the lock must not leak after a failed body")
  }
}
