package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: time the pq_ivf_serve bench segment (build once, serve n
  * times) exactly as Bench measures it — the r11 min-regression bisect.
  * Not part of the driver contract.
  *
  * Usage: runMain graft.tools.ProfilePqServe <sfDir> [runs]
  */
object ProfilePqServe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 7
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
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpus = emb.where(col("vec_id") >= 100)
      .select(col("vec_id").as("id"), col("embedding"))
    val idxDir = java.nio.file.Files.createTempDirectory("graft-profpq-")
      .toString + "/index"
    graft.operators.PqIndex.buildPqIvfIndex(corpus, idxDir, dim = 64,
      nlist = 16, m = 8, ksub = 64)
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      graft.operators.PqIndex.pqIvfQuery(queries, idxDir, k = 10, nprobe = 4)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PQSERVE median=${times.sorted.apply(times.size / 2)}%.3f min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
