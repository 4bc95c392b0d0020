package graft.streaming

import graft.SparkSuite
import graft.queries.Registry

/** Round-7 hardening pins (VERDICT r6 asks). */
class HardeningR7Spec extends SparkSuite {

  test("Registry.tbl(events) normalizes every ts shape to TimestampType, no conf mutation") {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    val before = spark.conf.get(key)

    // Driver testdata shape: TIMESTAMP_NTZ micros → session-zone timestamp.
    val df = Registry.tbl(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
    val ts = df.selectExpr("min(ts)", "max(ts)").collect()(0)
    assert(!ts.isNullAt(0) && !ts.isNullAt(1))
    assert(spark.conf.get(key) == before, "tbl must not touch session conf")

    // The UTC session makes the NTZ→timestamp cast value-preserving: the
    // rendered instant must equal the file's naive value read as NTZ.
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("min(cast(ts as string))").collect()(0).getString(0)
    val normalized = df.selectExpr("min(cast(ts as string))").collect()(0).getString(0)
    assert(normalized == raw, s"NTZ cast must not shift values: $normalized vs $raw")

    // Legacy pre-r7 scaled shape (raw int64 nanos): the reader branch was
    // deleted after the r8 regeneration left no such instance — the shape
    // must now FAIL FAST with the regeneration recipe, not silently flow
    // a Long ts into timestamp queries.
    val legacyDir = tmpDir("graft-legacy-events-")
    spark.range(3).selectExpr(
      "id as event_id",
      "1704067200000000000 + id * 1000000000 + 123456789 as ts", // ns past epoch
      "id as user_id", "'click' as event_type", "1.0 as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$legacyDir/events.parquet")
    val err = intercept[IllegalArgumentException] {
      Registry.tbl(spark, legacyDir, "events")
    }
    assert(err.getMessage.contains("ScaleData"),
      s"fail-fast must carry the regeneration recipe, got: ${err.getMessage}")
    assert(spark.conf.get(key) == before)
  }

  private def lockFs(lakeDir: String) = {
    val lake = new org.apache.hadoop.fs.Path(lakeDir)
    (lake.getFileSystem(spark.sessionState.newHadoopConf()), lake)
  }

  test("writer lock: a dead writer's lock older than the lease is reclaimed") {
    val dir = tmpDir("graft-lease-dead-")
    val (fs, lake) = lockFs(dir)
    val lock = Compact.ctl(lake, "lock")
    fs.mkdirs(lock.getParent)
    fs.create(lock, false).close()
    fs.setTimes(lock, System.currentTimeMillis() - 60000, -1) // died a minute ago
    var ran = false
    Compact.withWriterLock(fs, lake, leaseMs = 10000) { ran = true }
    assert(ran, "stale lock must be reclaimed, not fail-fast")
    assert(!fs.exists(lock), "lock released after the body")
  }

  test("writer lock: a live writer's lock within the lease is respected") {
    val dir = tmpDir("graft-lease-live-")
    val (fs, lake) = lockFs(dir)
    val lock = Compact.ctl(lake, "lock")
    fs.mkdirs(lock.getParent)
    fs.create(lock, false).close() // fresh mtime = a live holder
    val e = intercept[IllegalStateException] {
      Compact.withWriterLock(fs, lake, leaseMs = 60000) { fail("must not enter") }
    }
    assert(e.getMessage.contains("another maintenance writer"))
    assert(fs.exists(lock), "the live holder's lock must survive the failed attempt")
    fs.delete(lock, false)
  }

  test("writer lock: heartbeat refreshes the lease while the body runs") {
    val dir = tmpDir("graft-lease-beat-")
    val (fs, lake) = lockFs(dir)
    val lock = Compact.ctl(lake, "lock")
    Compact.withWriterLock(fs, lake, leaseMs = 1800) {
      val t0 = fs.getFileStatus(lock).getModificationTime
      Thread.sleep(1500) // > leaseMs/3 ⇒ at least one beat
      val t1 = fs.getFileStatus(lock).getModificationTime
      assert(t1 > t0, "heartbeat must advance the lock mtime")
      // a concurrent writer still fails fast — the lease is being renewed
      val e = intercept[IllegalStateException] {
        Compact.withWriterLock(fs, lake, leaseMs = 1800) { fail("must not enter") }
      }
      assert(e.getMessage.contains("another maintenance writer"))
    }
    assert(!fs.exists(lock))
  }
}
