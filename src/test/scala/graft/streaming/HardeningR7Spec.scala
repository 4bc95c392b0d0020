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
}
