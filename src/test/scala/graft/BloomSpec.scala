package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFunctions
import graft.operators.Dedup

/** Bloom sketch build/probe invariants: no false negatives (every member
  * hits), a usable false-positive rate at the sized fpp, and the
  * decontamination bloom tier being answer-preserving vs the exact path.
  */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  test("every inserted member probes true; non-members mostly miss") {
    val members = spark.range(0, 1000).select(concat(lit("m"), $"id").as("s"))
    val bf = members.agg(BloomFunctions.bloomAgg($"s", 1000, 0.01).as("bf")).scalar()
    val probedMembers = members
      .where(BloomFunctions.mightContain(bf, $"s")).count()
    assert(probedMembers == 1000, "bloom must have zero false negatives")
    val nonMembers = spark.range(0, 10000).select(concat(lit("x"), $"id").as("s"))
    val falsePos = nonMembers
      .where(BloomFunctions.mightContain(bf, $"s")).count()
    assert(falsePos < 10000 * 0.05, s"fp rate out of range: $falsePos/10000")
  }

  test("bloom-tier decontamination returns exactly the exact-join answer") {
    def words(seed: String, n: Int) = (1 to n).map(i => s"$seed$i").mkString(" ")
    val train = Seq(
      (1L, words("alpha", 20)),               // overlaps bench doc 100
      (2L, words("beta", 20)),                // clean
      (3L, words("alpha", 12) + " " + words("gamma", 8))) // partial overlap
      .toDF("doc_id", "text")
    val bench = Seq((100L, words("alpha", 20))).toDF("doc_id", "text")
    val exact = Dedup.contamination(train, "doc_id", "text", bench, "doc_id", "text", n = 8)
      .orderBy($"train_id", $"bench_id").collect().toSeq
    val bloomed = Dedup.contaminationBloom(train, "doc_id", "text", bench, "doc_id", "text",
      n = 8, expectedBenchGrams = 64)
      .orderBy($"train_id", $"bench_id").collect().toSeq
    assert(bloomed == exact)
    assert(exact.nonEmpty, "scenario must actually contaminate")
  }

  test("the corpus side of the bloom tier is filter-only — no join below the probe") {
    def words(seed: String, n: Int) = (1 to n).map(i => s"$seed$i").mkString(" ")
    val train = Seq((1L, words("alpha", 20))).toDF("doc_id", "text")
    val bench = Seq((100L, words("alpha", 20))).toDF("doc_id", "text")
    val plan = Dedup.contaminationBloom(train, "doc_id", "text", bench, "doc_id", "text", n = 8)
      .queryExecution.optimizedPlan
    // tier 1 is a scalar-subquery Filter — the ONLY join in the main plan
    // is the tier-2 exact verify over the flagged sliver (the corpus never
    // joins anything to be prefiltered)
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size == 1, s"expected only the tier-2 verify join, got:\n$plan")
    val bloomFilters = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]) => f }
    assert(bloomFilters.nonEmpty, s"bloom probe filter missing:\n$plan")
  }
}
