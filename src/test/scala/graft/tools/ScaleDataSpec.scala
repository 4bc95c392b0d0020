package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the scale-up tool's invariants at K=2 on sf0.001: the generated lake
  * must be a VALID larger instance of the same schema — row counts scale
  * linearly, foreign keys resolve, replica 0 is byte-identical to the source,
  * and cross-replica document text diverges enough that near-dup rates don't
  * multiply with K (the whole point of salting; VERDICT.md round-5 #1).
  */
class ScaleDataSpec extends SparkSuite {
  private val src = "/root/testdata/sf0.001"

  test("K=2 scale-up: linear counts, FK closure, replica-0 identity, bounded cross-replica similarity") {
    val dst = tmpDir("scale2")
    ScaleData.scale(spark, src, dst, 2)

    def cnt(dir: String, t: String) = graft.queries.Registry.tbl(spark, dir, t).count()
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"))
      assert(cnt(dst, t) == 2 * cnt(src, t), s"$t row count must double")
    // fixed dimensions are copied, not replicated
    assert(cnt(dst, "nation") == cnt(src, "nation"))
    assert(cnt(dst, "region") == cnt(src, "region"))

    // FK closure: every scaled lineitem resolves to a scaled order/part/supplier,
    // every scaled order to a scaled customer
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val ord = spark.read.parquet(s"$dst/orders.parquet")
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").count() == 0)
    assert(li.join(spark.read.parquet(s"$dst/part.parquet"),
      li("l_partkey") === col("p_partkey"), "left_anti").count() == 0)
    assert(ord.join(spark.read.parquet(s"$dst/customer.parquet"),
      ord("o_custkey") === col("c_custkey"), "left_anti").count() == 0)

    // keys stay globally unique after offsetting
    assert(ord.select("o_orderkey").distinct().count() == ord.count())
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())

    // replica 0 of documents is byte-identical to the source corpus
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val rep0 = docs.join(srcDocs.select(col("doc_id"), col("text").as("src_text")), "doc_id")
    assert(rep0.count() == srcDocs.count())
    assert(rep0.filter(col("text") =!= col("src_text")).count() == 0)

    // cross-replica twins diverge: a doc and its replica share < 60% of
    // distinct word-trigram shingles (below every dedup threshold in the
    // registry), so near-dup clusters do NOT grow with K
    val docStride = srcDocs.agg(max("doc_id")).head().getLong(0) + 1L
    val shingled = docs
      .withColumn("base_id", pmod(col("doc_id"), lit(docStride)))
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 10)
      .select(col("doc_id"), col("base_id"),
        explode(expr("transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))")).as("sh"))
      .distinct()
    val a = shingled.filter(col("doc_id") === col("base_id")).select(col("base_id"), col("sh"))
    val b = shingled.filter(col("doc_id") =!= col("base_id")).select(col("base_id").as("bid"), col("sh").as("bsh"))
    val jac = a.join(b, col("base_id") === col("bid") && col("sh") === col("bsh"))
      .groupBy("base_id").agg(count(lit(1)).as("inter"))
      .join(a.groupBy("base_id").agg(count(lit(1)).as("na")), "base_id")
      .join(b.groupBy(col("bid").as("base_id")).agg(count(lit(1)).as("nb")), "base_id")
      .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
    val maxJ = jac.agg(max("j")).head().getDouble(0)
    assert(maxJ < 0.6, s"cross-replica shingle Jaccard must stay under dedup thresholds, got $maxJ")

    // embeddings: same dimensionality, replica vectors perturbed but close
    // (cosine > 0.9 to its source twin — structure preserved, not duplicated)
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    val vecStride = spark.read.parquet(s"$src/embeddings.parquet")
      .agg(max("vec_id")).head().getLong(0) + 1L
    val dims = emb.select(size(col("embedding"))).distinct().collect().map(_.getInt(0))
    assert(dims.length == 1, "all embedding replicas keep the source dimensionality")
    val twins = emb.filter(col("vec_id") >= vecStride)
      .select((col("vec_id") - vecStride).as("vec_id"), col("embedding").as("e2"))
      .join(emb.filter(col("vec_id") < vecStride), "vec_id")
      .withColumn("dot", expr("aggregate(zip_with(embedding, e2, (x, y) -> CAST(x * y AS DOUBLE)), 0D, (s, v) -> s + v)"))
      .withColumn("n1", sqrt(expr("aggregate(embedding, 0D, (s, v) -> s + CAST(v * v AS DOUBLE))")))
      .withColumn("n2", sqrt(expr("aggregate(e2, 0D, (s, v) -> s + CAST(v * v AS DOUBLE))")))
      .withColumn("cos", col("dot") / (col("n1") * col("n2")))
    val stats = twins.agg(min("cos").as("mn"), max("cos").as("mx")).head()
    assert(stats.getDouble(0) > 0.9, s"replica vectors must stay near their source twin, min cos ${stats.getDouble(0)}")
    assert(stats.getDouble(1) < 1.0 - 1e-9, "replica vectors must not be exact duplicates")
  }
}
