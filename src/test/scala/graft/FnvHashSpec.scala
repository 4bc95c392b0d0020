package graft

import org.apache.spark.sql.functions._
import graft.functions.FnvHash64
import graft.functions.FnvHash64.fnv_hash64

/** Native codegen expression: correctness against published FNV-1a vectors,
  * interpreted vs codegen path agreement, SQL registration, null safety.
  */
class FnvHashSpec extends SparkSuite {
  import spark.implicits._

  // Published FNV-1a 64-bit test vectors (public domain reference values)
  private val vectors = Seq(
    "" -> 0xcbf29ce484222325L,
    "a" -> 0xaf63dc4c8601ec8cL,
    "foobar" -> 0x85944171f73967e8L)

  test("matches published FNV-1a 64 vectors through the Column API (codegen path)") {
    val got = vectors.map(_._1).toDF("s")
      .select(fnv_hash64($"s")).as[Long].collect().toSeq
    assert(got == vectors.map(_._2))
  }

  test("scala helper and Catalyst expression agree on random strings") {
    val strs = (0 until 50).map(i => s"doc-$i-${"x" * (i % 7)}")
    val viaExpr = strs.toDF("s").select(fnv_hash64($"s")).as[Long].collect().toSeq
    val viaScala = strs.map(s => FnvHash64.hash(s.getBytes("UTF-8")))
    assert(viaExpr == viaScala)
  }

  test("registers as a SQL function") {
    FnvHash64.register(spark)
    Seq("foobar").toDF("s").createOrReplaceTempView("fnv_in")
    val got = spark.sql("SELECT fnv_hash64(s) AS h FROM fnv_in").as[Long].head()
    assert(got == 0x85944171f73967e8L)
  }

  test("null in, null out") {
    val got = Seq(Some("x"), None).toDF("s")
      .select(fnv_hash64($"s").as("h")).collect()
    assert(got(0).getLong(0) == FnvHash64.hash("x".getBytes))
    assert(got(1).isNullAt(0))
  }
}
