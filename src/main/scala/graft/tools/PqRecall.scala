package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{PqIndex, Similarity}

/** Scale-gate tool: measure PQ ANN recall@k against brute-force truth at a
  * scaled instance, fixed-cut vs band-adaptive rerank.
  *
  * The round-7 sf10 gate found PQ recall collapsing when a confusable
  * near-dup cluster (~100 replicas at cosine ≥ 0.98, ScaleData's natural
  * output) outgrew the fixed k·refine candidate cut; the fix widens the
  * rerank to every candidate within the codebook's distortion band of the
  * boundary score. `bandCap = 1` reproduces the pre-fix fixed cut (the
  * rank filter binds before the band filter can admit anyone), so one run
  * reports the before/after pair SCALING.md cites.
  *
  * Usage: runMain graft.tools.PqRecall <sfDir> [nQueries] [k]
  */
object PqRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val nQ = if (args.length > 1) args(1).toInt else 100
    val k = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // dim from the data, not a hardcoded 64: a non-64-dim embeddings
    // instance would silently fit wrong codebooks (round-8 advice)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val queries = emb.where(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpus = emb.where(col("vec_id") >= nQ)
      .select(col("vec_id").as("id"), col("embedding"))
    val nCorpus = corpus.count()

    val exact = Similarity.bruteForceKnn(queries, corpus, k)
      .select(col("qid"), col("nid")).localCheckpoint()

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def recall(bandCap: Int): (Double, Double) = timed {
      val approx = PqIndex.pqAnn(queries, corpus, k, dim = dim,
        m = 8, ksub = 64, refine = 8, bandCap = bandCap)
        .select(col("qid"), col("nid"))
      val hits = approx.join(exact, Seq("qid", "nid"), "left_semi").count()
      hits.toDouble / (nQ.toLong * k)
    }

    val (fixedCut, _) = recall(bandCap = 1)
    // wall rides the recall run — no second full ANN execution per gate
    val (bandAdaptive, pqWall) = recall(bandCap = 32)

    // SQ8 tier (r11): same truth, same contract — near-exact recall is the
    // claim (per-dim resolution intact at 1 B/dim), so report wall too
    val (sq8Hits, sq8Wall) = timed {
      graft.operators.SqAnn.sq8Ann(queries, corpus, k)
        .select(col("qid"), col("nid"))
        .join(exact, Seq("qid", "nid"), "left_semi").count()
    }
    // ROUTED IVF-PQ curve (r13): the serve-cost dial on the persisted
    // memory-bound tier — build once, serve at each routeShards width;
    // recall must be monotone and the full width must match the scatter
    val routedDir = java.nio.file.Files
      .createTempDirectory("graft-pqrecall-routed-").toString + "/index"
    val nShards = 3
    val (_, buildWall) = timed {
      PqIndex.buildPqIvfIndexRouted(corpus, routedDir, nShards = nShards,
        dim = dim, nlist = 0x10, m = 8, ksub = 64)
    }
    def routedRecall(r: Int): (Double, Double) = timed {
      val approx = PqIndex.pqIvfQueryRouted(queries, routedDir, k,
        nprobe = 4, routeShards = r).select(col("qid"), col("nid"))
      approx.join(exact, Seq("qid", "nid"), "left_semi").count()
        .toDouble / (nQ.toLong * k)
    }
    val routed = (1 to nShards).map(r => r -> routedRecall(r))
    val routedJson = routed.map { case (r, (rec, w)) =>
      f""""r$r":{"recall":$rec%.4f,"wall":$w%.2f}""" }.mkString(",")

    println(s"""{"sf":"$sfDir","n_corpus":$nCorpus,"n_queries":$nQ,"k":$k,""" +
      s""""recall_fixed_cut":$fixedCut,"recall_band_adaptive":$bandAdaptive,""" +
      f""""recall_sq8":${sq8Hits.toDouble / (nQ.toLong * k)}%.4f,""" +
      f""""wall_sq8":$sq8Wall%.2f,"wall_pq":$pqWall%.2f,""" +
      f""""routed_pq_build":$buildWall%.2f,"routed_pq":{$routedJson}}""")
    spark.stop()
  }
}
