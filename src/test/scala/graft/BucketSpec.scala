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

  test("AQE splits a skewed join partition at runtime (OptimizeSkewedJoin)") {
    import spark.implicits._
    // 95% of the left side on one key; thresholds lowered so the tiny
    // corpus triggers the same machinery a 100 TB hot key would
    val left = (1 to 60000).map(i =>
      (if (i % 20 == 0) i.toLong % 97 else 7L, s"payload-$i-${"x" * 40}")).toDF("k", "v")
    val right = (0L to 96L).map(k => (k, s"dim-$k")).toDF("k", "d")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = left.join(right, Seq("k"))
      assert(joined.collect().length == 60000) // collect finalizes THIS plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"))
      assert(p.contains("skew=true"), s"skew split did not fire:\n$p")
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
