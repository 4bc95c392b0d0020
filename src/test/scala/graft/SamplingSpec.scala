package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic sampling/splits: the property that matters is that
  * membership is a pure function of the id — invariant under
  * repartitioning, row order, and corpus growth (df.sample() has none of
  * these guarantees).
  */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = graft.queries.Registry.tbl(spark, sfDir, "documents")
    .select($"doc_id", $"text")

  test("split assignment is invariant under repartitioning and row order") {
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val a = Sampling.splitAssign(docs, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = Sampling.splitAssign(docs.repartition(17, $"text").orderBy($"text"), "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a == b, "same id must get the same split on any partitioning")
    assert(a.values.toSet == Set("train", "val", "test"))
  }

  test("a doc keeps its split when the corpus grows (no contamination drift)") {
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    val half = Sampling.splitAssign(docs.where($"doc_id" < 250), "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val full = Sampling.splitAssign(docs, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    half.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("sample fraction is approximately honored and proportions are sane") {
    val n = docs.count().toDouble
    val frac = Sampling.deterministicSample(docs, "doc_id", 0.3).count() / n
    assert(frac > 0.2 && frac < 0.4, s"~0.3 expected, got $frac")
    val sizes = Sampling.splitAssign(docs, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(sizes("train") > sizes("val") && sizes("train") > sizes("test"))
    assert(sizes.values.sum == n.toLong)
  }

  test("different seeds draw different samples (seed is a real knob)") {
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.5, seed = "a")
      .select($"doc_id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(docs, "doc_id", 0.5, seed = "b")
      .select($"doc_id").as[Long].collect().toSet
    assert(s1 != s2)
  }

  test("stratified mixing: per-stratum fractions honored, 1.0 keeps all, 0.0 drops all") {
    val mixed = Sampling.stratifiedSample(docs.withColumn("src",
        concat(lit("s"), pmod($"doc_id", lit(4)))),
      "doc_id", "src", Map("s0" -> 1.0, "s1" -> 0.0, "s2" -> 0.5), defaultFraction = 0.25)
    val byStratum = mixed.groupBy($"src").count().as[(String, Long)].collect().toMap
    val totals = docs.withColumn("src", concat(lit("s"), pmod($"doc_id", lit(4))))
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(byStratum("s0") == totals("s0"), "fraction 1.0 must keep every row")
    assert(!byStratum.contains("s1"), "fraction 0.0 must drop the stratum entirely")
    assert(byStratum("s2") > 0 && byStratum("s2") < totals("s2"))
    assert(byStratum("s3") > 0 && byStratum("s3") < totals("s2").max(totals("s3")))
    // determinism: same recipe, repartitioned input, same membership
    val again = Sampling.stratifiedSample(docs.repartition(13).withColumn("src",
        concat(lit("s"), pmod($"doc_id", lit(4)))),
      "doc_id", "src", Map("s0" -> 1.0, "s1" -> 0.0, "s2" -> 0.5), defaultFraction = 0.25)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == mixed.select($"doc_id").as[Long].collect().toSet)
  }

  test("token-budget packing fills in id order and stops at the budget") {
    val rows = Seq(
      (1L, "a", 400L), (2L, "a", 400L), (3L, "a", 400L), (4L, "a", 400L),
      (10L, "b", 900L), (11L, "b", 200L), (12L, "b", 50L)
    ).toDF("id", "src", "w")
    val packed = Sampling.packByBudget(rows, "id", "w", "src", budget = 1000L)
      .select($"id", $"cum_weight").as[(Long, Long)].collect().toMap
    assert(packed.keySet == Set(1L, 2L, 10L), s"got $packed")
    assert(packed(2L) == 800L && packed(10L) == 900L)
  }

  test("misconfigured weights fail fast; fraction 1.0 keeps every row") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id", Seq("a" -> 0.5, "b" -> -0.2, "c" -> 0.7))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id", Seq("a" -> 0.9, "b" -> 0.3))
    }
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() == docs.count())
  }
}
