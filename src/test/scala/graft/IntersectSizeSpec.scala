package graft

import org.apache.spark.sql.functions._
import graft.functions.IntersectSize.intersect_size

/** The native intersect_size expression must equal
  * `size(array_intersect(a, b))` on every input — the Jaccard/containment
  * verify stages of the dedup pipelines ride on it.
  */
class IntersectSizeSpec extends SparkSuite {
  import spark.implicits._

  test("matches size(array_intersect) on real corpus shingle pairs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").where($"doc_id" < 200)
    val arrays = graft.operators.Dedup.shingleArrays(docs, "doc_id", "text", n = 3)
    // adjacent-id pairs: realistic mixed-overlap arrays
    val a = arrays.select(($"id" + 1).as("id"), $"sh".as("sh_a"))
    val pairs = a.join(arrays.select($"id", $"sh".as("sh_b")), Seq("id"))
    val diff = pairs.select(
        intersect_size($"sh_a", $"sh_b").as("native"),
        size(array_intersect($"sh_a", $"sh_b")).as("builtin"))
      .where($"native" =!= $"builtin")
    assert(diff.count() == 0)
  }

  test("edge cases: empty, disjoint, duplicates, null elements, null arrays") {
    val rows = Seq(
      (1L, Seq("a", "b", "c"), Seq("b", "c", "d")),      // plain overlap → 2
      (2L, Seq("a", "b"), Seq("x", "y")),                // disjoint → 0
      (3L, Seq.empty[String], Seq("a")),                 // empty side → 0
      (4L, Seq("a", "a", "b"), Seq("a", "a", "a")),      // dups count once → 1
      (5L, Seq("a", "X", "b"), Seq("X", "c")),           // null both sides → common
      (6L, Seq("a", "X"), Seq("a", "b")),                // null one side only
      (7L, null.asInstanceOf[Seq[String]], Seq("a"))     // null array → null out
    ).toDF("id", "a", "b")
      // plant real null ELEMENTS via transform (X → null)
      .select($"id",
        transform($"a", x => when(x =!= "X", x)).as("a"),
        transform($"b", x => when(x =!= "X", x)).as("b"))
    val got = rows.select($"id",
        intersect_size($"a", $"b").as("native"),
        size(array_intersect($"a", $"b")).as("builtin"))
      .as[(Long, Option[Int], Option[Int])].collect()
      .map { case (id, n, b) => id -> ((n, b)) }.toMap
    assert(got(1L) == ((Some(2), Some(2))))
    assert(got(2L) == ((Some(0), Some(0))))
    assert(got(3L) == ((Some(0), Some(0))))
    assert(got(4L) == ((Some(1), Some(1))))
    assert(got(5L) == ((Some(1), Some(1)))) // null present on BOTH sides counts once
    assert(got(6L) == ((Some(1), Some(1)))) // one-sided null never counts
    assert(got(7L) == ((None, None)))       // null array null-propagates
    // every row must agree with the builtin regardless of the literals above
    got.values.foreach { case (n, b) => assert(n == b) }
  }

  test("shared kernel: distinct count, smaller-side set, asymmetric sizes") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*) = new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    val c = graft.functions.IntersectSize.compute _
    assert(c(arr("p", "q", "r"), arr("q", "r", "s")) == 2)
    assert(c(arr("q", "r", "s"), arr("p", "q", "r")) == 2) // symmetric
    assert(c(arr("a"), arr("a", "b", "c", "d", "e", "a")) == 1)
    assert(c(arr(), arr("a")) == 0)
    assert(c(arr(), arr()) == 0)
  }
}
