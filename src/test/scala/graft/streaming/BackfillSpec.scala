package graft.streaming

import graft.SparkSuite

/** Partition backfill invariants: only the repaired partitions change (other
  * partitions' files stay byte-identical), re-running converges, and a crash
  * at the failpoint rolls back to the pre-repair state.
  */
class BackfillSpec extends SparkSuite {
  import spark.implicits._

  private def lakeOf(base: String): String = s"$base/lake"

  private def writeLake(base: String): Unit =
    Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2), (4L, "d", 2), (5L, "e", 3))
      .toDF("id", "v", "day")
      .write.partitionBy("day").parquet(lakeOf(base))

  private def files(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  private def state(base: String): Set[(Long, String, Int)] =
    spark.read.parquet(lakeOf(base))
      .select($"id", $"v", $"day".cast("int")).as[(Long, String, Int)].collect().toSet

  test("overwrites exactly the repaired partitions; others stay byte-untouched") {
    val base = tmpDir("graft-bf-")
    writeLake(base)
    val untouchedBefore = files(s"${lakeOf(base)}/day=1") ++ files(s"${lakeOf(base)}/day=3")

    // repair day 2: row 3 corrected, row 4 dropped, row 6 late-arrived
    val repaired = Seq((3L, "C2", 2), (6L, "f", 2)).toDF("id", "v", "day")
    val stats = Backfill.overwritePartitions(repaired, lakeOf(base), Seq("day"))
    assert(stats.partitionsPacked == 1)
    assert(state(base) == Set((1L, "a", 1), (2L, "b", 1), (3L, "C2", 2),
      (6L, "f", 2), (5L, "e", 3)))
    assert(files(s"${lakeOf(base)}/day=1") ++ files(s"${lakeOf(base)}/day=3")
      == untouchedBefore, "untouched partitions must not be rewritten")

    // idempotent: the same repair re-run converges to the same state
    Backfill.overwritePartitions(repaired, lakeOf(base), Seq("day"))
    assert(state(base) == Set((1L, "a", 1), (2L, "b", 1), (3L, "C2", 2),
      (6L, "f", 2), (5L, "e", 3)))
  }

  test("backfill can create a partition that did not exist yet") {
    val base = tmpDir("graft-bf2-")
    writeLake(base)
    Backfill.overwritePartitions(Seq((9L, "z", 9)).toDF("id", "v", "day"),
      lakeOf(base), Seq("day"))
    assert(state(base).contains((9L, "z", 9)))
  }

  test("crash before promote rolls back; the next pass completes the repair") {
    val base = tmpDir("graft-bf3-")
    writeLake(base)
    val before = state(base)
    val repaired = Seq((3L, "C2", 2)).toDF("id", "v", "day")
    intercept[RuntimeException] {
      Backfill.overwritePartitions(repaired, lakeOf(base), Seq("day"),
        crashBeforePromote = true)
    }
    // readers see the pre-repair state (stage is invisible; nothing promoted)
    assert(state(base) == before)
    // the next pass recovers the interrupted intent, then lands the repair
    Backfill.overwritePartitions(repaired, lakeOf(base), Seq("day"))
    assert(state(base) == Set((1L, "a", 1), (2L, "b", 1), (3L, "C2", 2), (5L, "e", 3)))
  }

  test("a partition column absent from the repaired frame fails fast") {
    val base = tmpDir("graft-bf4-")
    writeLake(base)
    val before = state(base)
    intercept[Exception] { // Spark rejects the stage write; nothing promoted
      Backfill.overwritePartitions(Seq((1L, "a", 1)).toDF("id", "v", "day"),
        lakeOf(base), Seq("nope"))
    }
    assert(state(base) == before)
  }
}
