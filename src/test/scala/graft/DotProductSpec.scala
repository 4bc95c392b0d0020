package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dot_product
import graft.functions.VectorFunctions

/** Native codegen'd dot product: bit-parity with the higher-order-function
  * left fold it replaced (oracle hashes must not move), float/double/mixed
  * element types, null and length-mismatch semantics, and the codegen pin.
  */
class DotProductSpec extends SparkSuite {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("bit-equal to the sequential HOF fold on double arrays") {
    val df = Seq(
      (Array(1.5, -2.25, 3.125), Array(0.5, 4.0, -1.0)),
      (Array(0.1, 0.2, 0.3), Array(0.3, 0.2, 0.1)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      dot_product($"a", $"b").as("native"),
      hofDot($"a", $"b").as("hof")).as[(Double, Double)].collect()
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
        s"native $n != hof $h")
    }
  }

  test("float arrays work directly and match the cast-then-fold result") {
    val df = Seq((Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val (n, h) = df.select(
      dot_product($"a", $"b").as("native"),
      hofDot(VectorFunctions.toDouble($"a"), VectorFunctions.toDouble($"b")).as("hof"))
      .as[(Double, Double)].head()
    assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
  }

  test("mixed float/double sides (raw embedding vs double-literal plane)") {
    val df = Seq((Array(2.0f, 3.0f), 0)).toDF("a", "x")
    val v = df.select(dot_product($"a", typedLit(Seq(0.5, -1.0)))).as[Double].head()
    assert(v == 2.0 * 0.5 + 3.0 * -1.0)
  }

  test("null array, null element, and length mismatch all yield NULL — HOF fold parity") {
    // failure behavior must match the zip_with/aggregate fold exactly: a
    // malformed embedding becomes a null similarity that threshold filters
    // drop, never an exception that kills a billion-pair job
    graft.functions.DotProduct.register(spark)
    spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0D, 2.0D), array(3.0D, 4.0D)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(3.0D, 4.0D)),
        |  (array(1.0D, NULL, 2.0D), array(5.0D, 7.0D, 11.0D)),
        |  (array(1.0D, 2.0D), array(3.0D)) AS t(a, b)""".stripMargin)
      .createOrReplaceTempView("dp_cases")
    val rows = spark.sql(
      """SELECT dot_product(a, b) AS native,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS hof
        |FROM dp_cases""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null behavior must match the fold: native=${r.get(0)} hof=${r.get(1)}")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(rows.count(_.isNullAt(0)) == 3)
  }

  test("the pair loop stays inside WholeStageCodegen (no fallback)") {
    // a real scan (local relations constant-fold the projection away)
    val emb = graft.queries.Registry.tbl(spark, sfDir, "embeddings")
    val df = emb.select(dot_product($"embedding", $"embedding").as("sq"))
    // the "*(n)" prefix marks a WholeStageCodegen stage; the Project
    // carrying dot_product must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("dot_product"),
      s"expected the dot_product projection inside a codegen stage:\n$plan")
    // and the codegen'd value agrees with the interpreted HOF fold
    val both = emb.select(
      dot_product($"embedding", $"embedding").as("native"),
      hofDot(VectorFunctions.toDouble($"embedding"), VectorFunctions.toDouble($"embedding")).as("hof"))
      .limit(20).as[(Double, Double)].collect()
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }
}
