package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.Registry

/** Dev tool: split q100_ivf_index_persisted into its phases (corpus count,
  * quantizer fit, delete-first pass, cell-partitioned write, serve, exact
  * brute-force, recall-contract join) and time each — the bisect the r11
  * verdict asked for. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.ProfileIvf <sfDir> [runs]
  */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm codegen on sf0.001 end-to-end once
    try Registry.byName("q100_ivf_index_persisted")
      .run(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"warmup failed: ${e.getMessage}") }

    (1 to runs).foreach { i =>
      println(s"=== run $i ===")
      val base = Registry.tmpDir("graft-profivf-")
      val emb = Registry.tbl(spark, sfDir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      val tot0 = System.nanoTime()
      // inline the buildIvfIndex phases (mirrors Similarity.buildIvfIndex)
      locally {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val indexDir = s"$base/index-phased"
        val nl0 = t("b1_count_nlistFor") { Similarity.nlistFor(corpus.count()) }
        val cVec = corpus.withColumn("__features", array_to_vector(col("embedding")))
        val fitSet = t("b2_fitSample_cache") {
          val f = cVec.orderBy(xxhash64(col("id")), col("id")).limit(100000).cache()
          f.count(); f
        }
        val nl = math.max(1L, math.min(nl0.toLong, fitSet.count())).toInt
        val model = t("b3_kmeans_fit") {
          new KMeans().setK(nl).setSeed(42L).setFeaturesCol("__features").fit(fitSet)
        }
        t("b3a_kmeans_iter8") {
          new KMeans().setK(nl).setSeed(42L).setMaxIter(8)
            .setFeaturesCol("__features").fit(fitSet)
        }
        t("b3b_kmeans_iter8_rand") {
          new KMeans().setK(nl).setSeed(42L).setMaxIter(8).setInitMode("random")
            .setFeaturesCol("__features").fit(fitSet)
        }
        fitSet.unpersist()
        t("b4_assign_write") {
          model.transform(cVec)
            .select(col("id").as("nid"), col("embedding").as("ne"),
              col("embedding").as("__drop"), col(model.getPredictionCol).as("cell"))
            .drop("__drop")
            .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/corpus")
        }
      }
      t("build_total") {
        Similarity.buildIvfIndex(corpus, s"$base/index", nlist = 0)
      }
      val approx = t("serve_plan+collect") {
        Similarity.ivfIndexQuery(queries, s"$base/index", k = 5, nprobe = 4)
      }
      t("serve_materialize") {
        approx.write.format("noop").mode("overwrite").save()
      }
      val exact = Similarity.bruteForceKnn(queries, corpus, k = 5)
      t("exact_bruteforce") {
        exact.write.format("noop").mode("overwrite").save()
      }
      println(f"TOTAL ${(System.nanoTime() - tot0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
