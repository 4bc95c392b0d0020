package graft.streaming

import graft.SparkSuite
import graft.queries.Registry

/** Round-7 hardening pins (VERDICT r6 asks). */
class HardeningR7Spec extends SparkSuite {

  test("Registry.tbl(events) leaves session conf untouched and still reads nanos correctly") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // Start from a clean session state for the key (getOption then reports
    // the SQLConf default, "false").
    spark.conf.unset(key)
    val before = spark.conf.get(key)
    assert(before == "false")

    val df = Registry.tbl(spark, sfDir, "events")
    assert(spark.conf.get(key) == before,
      "tbl must not leak nanosAsLong into the session conf")

    // Execution happens AFTER the conf was restored — the explicit-schema
    // read must still map INT64(TIMESTAMP NANOS) to long and truncate to µs.
    val n = df.count()
    assert(n > 0)
    val ts = df.selectExpr("min(ts)", "max(ts)").collect()(0)
    assert(!ts.isNullAt(0) && !ts.isNullAt(1))
    assert(spark.conf.get(key) == before, "conf must stay clean after execution")

    // A pre-existing user value must be restored, not clobbered (fresh dir
    // so the schema cache doesn't short-circuit the inference path).
    spark.conf.set(key, "false")
    Registry.tbl(spark, "/root/testdata/sf0.01", "events").count()
    assert(spark.conf.get(key) == "false")
    spark.conf.unset(key)
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
