package graft.streaming

import graft.SparkSuite

/** Key-erasure invariants: every row for the subject keys is gone, rows of
  * other keys survive bit-exact, and files that never contained a target
  * key are not rewritten (the file-pruned copy-on-write contract).
  */
class EraseSpec extends SparkSuite {
  import spark.implicits._

  private def files(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("erases the subject keys only, rewriting only files that contain them") {
    val base = tmpDir("graft-er-")
    val lake = s"$base/lake"
    // two partition dirs; day=1 gets two files, only one containing user 7
    Seq((7L, "x1", 1), (8L, "y1", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.partitionBy("day").parquet(lake)
    Seq((9L, "z1", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(lake)
    Seq((7L, "x2", 2), (10L, "w1", 2)).toDF("user_id", "v", "day")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(lake)
    val before = files(lake)

    val stats = Erase.eraseKeys(spark, lake, "user_id", Seq(7L, 99L).toDF("user_id"))
    val after = files(lake)

    val got = spark.read.parquet(lake)
      .select($"user_id", $"v", $"day".cast("int")).as[(Long, String, Int)].collect().toSet
    assert(got == Set((8L, "y1", 1), (9L, "z1", 1), (10L, "w1", 2)))
    // the file holding only user 9 was never opened or moved
    val survivors = before.keySet.intersect(after.keySet)
    assert(survivors.exists(_.contains("day=1")),
      "day=1's user-9-only file must survive untouched")
    survivors.foreach(p => assert(before(p) == after(p), s"$p was rewritten"))
    assert(stats.filesBefore == 2, "exactly the two files containing user 7 retired")
  }

  test("erasing a key that empties a file retires the file with no replacement") {
    val base = tmpDir("graft-er2-")
    val lake = s"$base/lake"
    Seq((1L, "a", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.partitionBy("day").parquet(lake)
    Seq((2L, "b", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(lake)
    Erase.eraseKeys(spark, lake, "user_id", Seq(1L).toDF("user_id"))
    val got = spark.read.parquet(lake)
      .select($"user_id").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("no-op when no file contains any subject key") {
    val base = tmpDir("graft-er3-")
    val lake = s"$base/lake"
    Seq((1L, "a", 1)).toDF("user_id", "v", "day")
      .write.partitionBy("day").parquet(lake)
    val before = files(lake)
    val stats = Erase.eraseKeys(spark, lake, "user_id", Seq(42L).toDF("user_id"))
    assert(stats == Compact.Stats(0, 0, 0))
    assert(files(lake) == before)
  }

  test("an erasure touching more files than the cap fails fast, lake untouched") {
    val base = tmpDir("graft-er4-")
    val lake = s"$base/lake"
    // key 1 lives in two files
    Seq((1L, "a", 1)).toDF("user_id", "v", "day")
      .coalesce(1).write.partitionBy("day").parquet(lake)
    Seq((1L, "b", 2)).toDF("user_id", "v", "day")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(lake)
    val before = files(lake)
    val e = intercept[IllegalStateException] {
      Erase.eraseKeys(spark, lake, "user_id", Seq(1L).toDF("user_id"),
        maxAffectedFiles = 1)
    }
    assert(e.getMessage.contains("maxAffectedFiles"), e.getMessage)
    // refused BEFORE any rewrite: every file is still in place, unmodified
    assert(files(lake) == before)
    assert(spark.read.parquet(lake).count() == 2)
    // an explicitly raised cap lets the same request through
    val stats = Erase.eraseKeys(spark, lake, "user_id", Seq(1L).toDF("user_id"),
      maxAffectedFiles = 10)
    assert(stats.filesBefore == 2)
    // both files held only key 1 — they retire with no replacement
    assert(files(lake).isEmpty)
  }
}
