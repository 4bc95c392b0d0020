package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashSigs.minhash_sigs
import graft.operators.Dedup

/** Row-level parity of the narrow (native-expression) MinHash/LSH path
  * against the aggregation formulation it replaces — the agg form is the
  * semantics contract the DuckDB oracle mirrors.
  */
class MinHashSigsSpec extends SparkSuite {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    .select($"doc_id", $"text")

  test("native signatures equal the agg-form minhashWide column-for-column") {
    val arrays = Dedup.shingleArrays(docs, "doc_id", "text", n = 3)
    val narrow = arrays.select($"id", minhash_sigs($"sh", 16).as("sig"))
      .select($"id" +: (0 until 16).map(i => element_at($"sig", i + 1).as(s"h$i")): _*)
    val shingled = arrays.select($"id", explode($"sh").as("shingle"))
    val agg = Dedup.minhashWide(shingled, 16)
    assert(narrow.exceptAll(agg).count() === 0)
    assert(agg.exceptAll(narrow).count() === 0)
  }

  test("narrow banding is row-identical to the agg-form banding") {
    val arrays = Dedup.shingleArrays(docs, "doc_id", "text", n = 3)
    val narrow = Dedup.minhashBandsNarrow(arrays, 16, 2)
    val agg = Dedup.minhashBands(
      arrays.select($"id", explode($"sh").as("shingle")), 16, 2)
    assert(narrow.exceptAll(agg).count() === 0)
    assert(agg.exceptAll(narrow).count() === 0)
  }

  test("null shingle elements are skipped; empty arrays yield empty sigs") {
    val rows = Seq(
      (1L, Seq[String]("a b c", "b c d")),
      (2L, Seq[String]()),
      (3L, null.asInstanceOf[Seq[String]])).toDF("id", "sh")
    val got = rows.select($"id", minhash_sigs($"sh", 4).as("sig"))
      .orderBy($"id").collect()
    assert(got(0).getSeq[String](1).size === 4)
    assert(got(1).getSeq[String](1).isEmpty)
    assert(got(2).isNullAt(1))
    // null elements skipped like agg min: sig over (x, null) == sig over (x)
    val withNull = Seq((1L, Seq("a b c", null))).toDF("id", "sh")
      .select(minhash_sigs($"sh", 4).as("sig")).head().getSeq[String](0)
    val without = Seq((1L, Seq("a b c"))).toDF("id", "sh")
      .select(minhash_sigs($"sh", 4).as("sig")).head().getSeq[String](0)
    assert(withNull === without)
  }

  test("the narrow path's plan has no exchange before the sig projection") {
    val arrays = Dedup.shingleArrays(docs, "doc_id", "text", n = 3)
    val plan = Dedup.minhashBandsNarrow(arrays, 16, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signature stage should be map-only:\n$plan")
  }
}
