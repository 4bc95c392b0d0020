package graft

import java.math.BigInteger
import org.apache.spark.sql.functions._
import graft.functions.CentSum128.centSum128

/** Custom TypedImperativeAggregate: exactness vs decimal sums, spill path
  * past int64, and partition-merge correctness.
  */
class CentSumSpec extends SparkSuite {
  import spark.implicits._

  test("matches the exact decimal sum on real money data") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + 0.5).cast("long")
    val rows = li.groupBy($"l_returnflag")
      .agg(centSum128(cents, 4).as("fast"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("decimal(28,4)")).cast("double").as("exact"))
      .select($"fast", $"exact").as[(Double, Double)].collect()
    rows.foreach { case (fast, exact) => assert(fast == exact, s"$fast != $exact") }
  }

  test("exact past int64: sums that overflow a long spill into the wide part") {
    // 200 rows of 2^60 cents overflow int64 ~25× over
    val big = (1L << 60)
    val df = Seq.fill(200)(big).toDF("c").repartition(4)
    val got = df.agg(centSum128($"c", 0)).as[Double].head()
    val expected = new java.math.BigDecimal(
      BigInteger.valueOf(big).multiply(BigInteger.valueOf(200))).doubleValue()
    assert(got == expected)
    // and mixed signs cancel exactly
    val mixed = (Seq.fill(100)(big) ++ Seq.fill(100)(-big) :+ 42L).toDF("c").repartition(8)
    assert(mixed.agg(centSum128($"c", 0)).as[Double].head() == 42.0)
  }

  test("nulls are ignored like built-in sum") {
    val df = Seq(Some(100L), None, Some(23L)).toDF("c")
    assert(df.agg(centSum128($"c", 2)).as[Double].head() == 1.23)
  }

  test("inputs beyond the no-wrap invariant are rejected loudly") {
    val df = Seq(1L << 61).toDF("c")
    val e = intercept[Exception] { df.agg(centSum128($"c", 0)).collect() }
    assert(e.getMessage != null)
  }
}
