package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Dev tool: time named registry queries end-to-end (noop sink) with the
  * bench session config — the per-query iteration loop that Bench's full
  * sweep is too slow for. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.TimeOne <sfDir> <name>[,<name>…] [runs]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(',').toSeq else Seq("q47_corpus_pipeline")
    val runs = if (args.length > 2) args(2).toInt else 3
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
    names.foreach { n =>
      val q = Registry.byName(n)
      try q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$n warmup failed: ${e.getMessage}") }
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $n median=${times.sorted.apply(times.size / 2)}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
