package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: deterministic scale-up of a driver testdata directory.
  *
  * `/root/testdata` tops out at sf0.1 and is read-only; the round-5 verdict's
  * top ask is an EMPIRICAL scale test of the bucket-bounded dedup/ANN designs
  * (VERDICT.md "Next round #1"). This tool replicates every table K times with
  * key-offset strides so the result is a valid sf(0.1·K) instance of the same
  * star schema:
  *
  *   - Foreign keys stay consistent: replica i of `orders` points at replica i
  *     of `customer` (same stride arithmetic on both sides), replica i of
  *     `lineitem` at replica i of orders/part/supplier.
  *   - `region`/`nation` are fixed dimensions (25 nations at every TPC-H SF) —
  *     copied once; customer/supplier replicas keep their original nationkey,
  *     so dimension joins fan out exactly like a bigger TPC-H instance.
  *   - `documents.text` is salted per replica (a deterministic replica token
  *     spliced after every 4th word) so the near-duplicate RATE stays constant
  *     instead of every doc gaining K−1 cross-replica twins: planted near-dup
  *     pairs inside a replica receive the same splices at the same positions
  *     (the splice depends only on replica and word index) and so remain
  *     near-dups, while cross-replica Jaccard drops well below the 0.6–0.8
  *     thresholds the dedup queries use. Replica 0 is byte-identical to the
  *     source, so sf0.1-tuned expectations remain a subset.
  *   - `embeddings.embedding` gets small deterministic per-(vec,replica,dim)
  *     noise (hash-derived, ±0.05) — cluster/label structure survives, but
  *     replicas are not exact twins, so ANN recall contracts are stressed
  *     honestly rather than trivially satisfied by duplicate vectors.
  *   - `events.ts` is read and written in the source's own shape
  *     (TIMESTAMP_NTZ micros in the driver's testdata), so scaled
  *     directories go through exactly the same
  *     [[graft.queries.Registry.tbl]] normalization as the originals.
  *
  * Everything is a pure function of (source bytes, K): no RNG, no clock — two
  * runs produce identical lakes, so benchmarks across rounds are comparable.
  *
  * Usage: runMain graft.tools.ScaleData <srcDir> <dstDir> <K> [tables]
  * `tables` (comma list, default all): restrict output to a table subset —
  * e.g. `documents,embeddings` for a corpus-only sf10 instance that skips
  * replicating the TPC-H fact tables nobody will query at that SF.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "data/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val tables = if (args.length > 3) Some(args(3).split(',').map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, k, tables)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, dst: String, k: Int,
      tables: Option[Set[String]] = None): Unit = {
    require(k >= 1, s"replication factor must be >= 1, got $k")
    def want(name: String): Boolean = tables.forall(_.contains(name))
    if (want("region")) copy(spark, src, dst, "region")
    if (want("nation")) copy(spark, src, dst, "nation")

    lazy val custStride = stride(spark, src, "customer", "c_custkey")
    lazy val suppStride = stride(spark, src, "supplier", "s_suppkey")
    lazy val partStride = stride(spark, src, "part", "p_partkey")
    lazy val orderStride = stride(spark, src, "orders", "o_orderkey")

    if (want("customer")) write(dst, "customer", replicate(read(spark, src, "customer"), k)
      .withColumn("c_custkey", offset(col("c_custkey"), custStride))
      .withColumn("c_name", salt(col("c_name")))
      .drop("rep"))
    if (want("supplier")) write(dst, "supplier", replicate(read(spark, src, "supplier"), k)
      .withColumn("s_suppkey", offset(col("s_suppkey"), suppStride))
      .withColumn("s_name", salt(col("s_name")))
      .drop("rep"))
    if (want("part")) write(dst, "part", replicate(read(spark, src, "part"), k)
      .withColumn("p_partkey", offset(col("p_partkey"), partStride))
      .withColumn("p_name", salt(col("p_name")))
      .drop("rep"))
    if (want("orders")) write(dst, "orders", replicate(read(spark, src, "orders"), k)
      .withColumn("o_orderkey", offset(col("o_orderkey"), orderStride))
      .withColumn("o_custkey", offset(col("o_custkey"), custStride))
      .drop("rep"))
    if (want("lineitem")) write(dst, "lineitem", replicate(read(spark, src, "lineitem"), k)
      .withColumn("l_orderkey", offset(col("l_orderkey"), orderStride))
      .withColumn("l_partkey", offset(col("l_partkey"), partStride))
      .withColumn("l_suppkey", offset(col("l_suppkey"), suppStride))
      .drop("rep"))

    if (want("events")) {
      val eventStride = stride(spark, src, "events", "event_id")
      val userStride = stride(spark, src, "events", "user_id")
      write(dst, "events", replicate(read(spark, src, "events"), k)
        .withColumn("event_id", offset(col("event_id"), eventStride))
        .withColumn("user_id", offset(col("user_id"), userStride))
        .drop("rep"))
    }

    if (want("documents")) {
    val docStride = stride(spark, src, "documents", "doc_id")
    val salted = replicate(read(spark, src, "documents"), k)
      .withColumn("doc_id", offset(col("doc_id"), docStride))
      // splice "repN" after every 4th word for replicas > 0; replica 0 stays
      // byte-identical. transform((w, i) -> ...) keeps this inside codegen.
      // Density matters: every shingle window that touches a salted word
      // changes, and the corpus's template-heavy docs keep "destroyed"
      // shingles alive at other positions — every-8th salting measured a
      // worst-case cross-replica Jaccard of 0.69 (above the 0.6 dedup
      // threshold); every-4th leaves at most 1 surviving window in 4.
      .withColumn("text",
        when(col("rep") === 0, col("text")).otherwise(
          array_join(
            transform(split(col("text"), " "), (w, i) =>
              when(i % 4 === 3, concat(w, lit(" rep"), col("rep"))).otherwise(w)),
            " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep")
    write(dst, "documents", salted)
    }

    if (want("embeddings")) {
    val vecStride = stride(spark, src, "embeddings", "vec_id")
    write(dst, "embeddings", replicate(read(spark, src, "embeddings"), k)
      .withColumn("vec_id", offset(col("vec_id"), vecStride))
      // hash-derived noise in [-0.05, 0.05) per (vec, replica, dim);
      // replica 0 untouched so the source corpus is preserved verbatim.
      // The source vectors are unit-norm (dim 64), so this lands replica
      // twins at cosine ≈ 0.97 to their source — same cluster, not a copy.
      .withColumn("embedding",
        when(col("rep") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (v, d) =>
            (v + (pmod(hash(col("vec_id"), col("rep"), d), lit(1000)) - 500)
              .cast("float") * lit(0.0001f)).cast("float"))))
      .drop("rep"))
    }
  }

  private def read(spark: SparkSession, src: String, name: String): DataFrame =
    // events.ts passes through untouched in its source shape (NTZ micros in
    // testdata) — Registry.tbl normalizes it identically for source and copy.
    spark.read.parquet(s"$src/$name.parquet")

  /** K copies of df, each tagged with its replica ordinal. The replica side is
    * a K-row local range — Spark broadcasts it, so this is a narrow fan-out of
    * the big side, not a shuffle.
    */
  private def replicate(df: DataFrame, k: Int): DataFrame =
    df.crossJoin(broadcast(df.sparkSession.range(k).toDF("rep")))

  private def offset(key: org.apache.spark.sql.Column, strideV: Long) =
    key + col("rep") * strideV

  /** Name salting for replicas > 0 so display-name columns stay unique across
    * replicas (grouping by name must not merge replicas).
    */
  private def salt(name: org.apache.spark.sql.Column) =
    when(col("rep") === 0, name).otherwise(concat(name, lit("#r"), col("rep")))

  private def stride(spark: SparkSession, src: String, name: String, key: String): Long =
    read(spark, src, name).agg(max(col(key))).head().getLong(0) + 1L

  private def copy(spark: SparkSession, src: String, dst: String, name: String): Unit =
    write(dst, name, read(spark, src, name))

  private def write(dst: String, name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
}
