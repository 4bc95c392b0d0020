package graft

import org.apache.spark.sql.functions._
import graft.functions.NearestCell

/** Native nearest-centroid expression (r11): parity with the explicit
  * HOF distance computation it replaced on the incremental-ingest path,
  * plus null/dim semantics.
  */
class NearestCellSpec extends SparkSuite {
  import spark.implicits._

  private val cents: Seq[Seq[Double]] =
    Seq(Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0), Seq(-1.0, 2.0, 0.5))

  test("argmin matches the explicit HOF distance computation; ties take the lowest cell") {
    val rows = Seq(
      Seq(0.1, 0.0, 0.1), Seq(0.9, 1.1, 1.0), Seq(-0.8, 1.7, 0.4),
      Seq(0.5, 0.5, 0.5), // equidistant from cells 0 and 1 -> lowest wins
      Seq(100.0, -50.0, 3.0)).toDF("embedding")
    val centLit = typedLit(cents)
    val hof = rows.select(
      (array_position(
        transform(centLit, c => aggregate(
          zip_with(c, col("embedding"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, v) => a + v)),
        array_min(transform(centLit, c => aggregate(
          zip_with(c, col("embedding"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, v) => a + v)))) - 1).cast("int").as("cell"))
      .collect().map(_.getInt(0)).toSeq
    val native = rows.select(
      NearestCell.nearest_cell(col("embedding"), cents).as("cell"))
      .collect().map(_.getInt(0)).toSeq
    assert(native == hof)
    assert(native(3) == 0, "tie must resolve to the lowest cell id")
  }

  test("null in, null out; wrong-dim input is a loud error") {
    val withNull = Seq(Some(Seq(0.1, 0.0, 0.1)), None).toDF("embedding")
    val got = withNull.select(
      NearestCell.nearest_cell(col("embedding"), cents).as("cell")).collect()
    assert(got(0).getInt(0) == 0 && got(1).isNullAt(0))
    val bad = Seq(Seq(1.0, 2.0)).toDF("embedding")
    val ex = intercept[Exception] {
      bad.select(NearestCell.nearest_cell(col("embedding"), cents)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("dim 2")), msgs(ex).mkString(" | "))
  }
}
