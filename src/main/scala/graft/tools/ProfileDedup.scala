package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.Registry

/** Dev tool: stage-by-stage timing of the q70 dup-cluster pipeline, to
  * attribute sf1 cost (candidates vs verify vs label propagation).
  * Usage: runMain graft.tools.ProfileDedup <sfDir>
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    // mirror of TextQueries.withPlanted (private[queries])
    val docs = Registry.tbl(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val planted = docs.unionByName(
      docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 8000100000L).as("doc_id"),
          concat(col("text"), lit(" graft extra trailing words")).as("text")))
      .unionByName(
        docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 8000200000L).as("doc_id"), col("text")))
    t("planted_count")(planted.count())
    val arrays = t("arrays_materialize")(
      Dedup.shingleArrays(planted, "doc_id", "text", n = 3).localCheckpoint())
    t("avg_shingles")(arrays.agg(avg(size(col("sh")))).head.getDouble(0).round)
    val bands = t("minhash_bands")(
      Dedup.minhashBandsNarrow(arrays, k = 16, rowsPerBand = 2).localCheckpoint())
    t("max_bucket")(bands.groupBy("band", "band_sig").count()
      .agg(max("count")).head.getLong(0))
    val candidates = t("lsh_candidates")(Dedup.lshCandidates(bands).localCheckpoint())
    t("candidate_count")(candidates.count())
    val pairs = t("jaccard_verify")(
      Dedup.jaccardOnArrays(candidates, arrays)
        .where(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b")).localCheckpoint())
    t("pair_count")(pairs.count())
    val clusters = t("label_propagation")(Dedup.clusters(pairs).localCheckpoint())
    t("cluster_rows")(clusters.count())

    // jaccard variants on the SAME checkpointed candidates/arrays:
    // (a) ids-only double join, no intersect — isolates join/shuffle cost
    t("jaccard_joins_only")(
      candidates
        .join(arrays.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(arrays.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b")).count())
    // (b) repartitioned-width pipeline end-to-end, as q47 pins it
    val planted32 = planted.repartition(32, col("doc_id"))
    val arrays3 = Dedup.shingleArrays(planted32, "doc_id", "text", n = 3)
    val cand3 = Dedup.lshCandidates(
      Dedup.minhashBandsNarrow(arrays3, k = 16, rowsPerBand = 2))
    val pairs3 = Dedup.jaccardOnArrays(cand3, arrays3)
      .where(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    t("q70_repartitioned_full")(
      Dedup.clusters(pairs3)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
        .orderBy(col("cluster_id")).count())

    // the REAL query shape: no stepwise checkpoints, exactly as q70 runs
    val arrays2 = Dedup.shingleArrays(planted, "doc_id", "text", n = 3)
    val cand2 = Dedup.lshCandidates(
      Dedup.minhashBandsNarrow(arrays2, k = 16, rowsPerBand = 2))
    val pairs2 = Dedup.jaccardOnArrays(cand2, arrays2)
      .where(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    t("q70_full_uncheckpointed")(
      Dedup.clusters(pairs2)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
        .orderBy(col("cluster_id")).count())
    spark.stop()
  }
}
