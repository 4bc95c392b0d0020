package graft.streaming

import graft.SparkSuite

/** Retention sweep invariants: only wholly-expired hour partitions drop,
  * the boundary hour survives, and misaligned cutoffs are rejected.
  */
class RetentionSpec extends SparkSuite {
  import spark.implicits._

  private def buildLake(): String = {
    val lake = tmpDir("graft-ret-") + "/lake"
    // three hourly partitions around the cutoff
    Seq((1L, 2024, 1, 1, 22), (2L, 2024, 1, 1, 23), (3L, 2024, 1, 2, 0))
      .toDF("id", "year", "month", "day", "hour")
      .write.partitionBy("year", "month", "day", "hour").parquet(lake)
    lake
  }

  test("drops partitions strictly before the cutoff; boundary hour survives") {
    val lake = buildLake()
    val stats = Retention.sweep(spark, lake,
      java.sql.Timestamp.valueOf("2024-01-01 23:00:00"))
    assert(stats.partitionsPacked == 1 && stats.filesBefore >= 1)
    val ids = spark.read.parquet(lake).select($"id").as[Long].collect().toSet
    // hour 22 (range [22,23)) is wholly expired; hour 23 covers the cutoff
    // instant itself and must survive
    assert(ids == Set(2L, 3L))
    // the emptied dir chain is pruned, the lake root is not
    assert(!new java.io.File(s"$lake/year=2024/month=1/day=1/hour=22").exists)
    assert(new java.io.File(lake).exists)
  }

  test("sweep is idempotent and a later cutoff continues the expiry") {
    val lake = buildLake()
    Retention.sweep(spark, lake, java.sql.Timestamp.valueOf("2024-01-01 23:00:00"))
    val again = Retention.sweep(spark, lake,
      java.sql.Timestamp.valueOf("2024-01-01 23:00:00"))
    assert(again == Compact.Stats(0, 0, 0))
    Retention.sweep(spark, lake, java.sql.Timestamp.valueOf("2024-01-02 01:00:00"))
    // all three hours now expired: no data files remain
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    assert(!walk(new java.io.File(lake)).exists(_.getName.endsWith(".parquet")))
  }

  test("a cutoff not aligned to the hour is rejected") {
    val lake = buildLake()
    intercept[IllegalArgumentException] {
      Retention.sweep(spark, lake, java.sql.Timestamp.valueOf("2024-01-01 23:30:00"))
    }
  }
}
