package graft

import org.apache.spark.sql.functions._

/** Co-located bucketed join: the shuffle-elimination strategy for repeated
  * big-big joins at scale (SURVEY.md "Partitioning & shuffle"). Both sides
  * bucketed by the join key → sort-merge join with zero Exchange.
  */
class BucketSpec extends SparkSuite {

  test("bucketed tables join without a shuffle and match the unbucketed result") {
    val li = Registry.tbl(spark, sfDir, "lineitem")
    val o = Registry.tbl(spark, sfDir, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    // disable broadcast so the join must pick SMJ — that's the shape this
    // strategy targets (two big sides)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val planStr = joined.queryExecution.executedPlan.toString
      val exchanges = planStr.linesIterator.count(_.contains("Exchange hashpartitioning"))
      // the join itself must be exchange-free; only the final groupBy may shuffle
      assert(planStr.contains("SortMergeJoin"), planStr)
      assert(exchanges <= 1, s"join sides must not re-shuffle:\n$planStr")

      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  private lazy val Registry = graft.queries.Registry

  private def withConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
