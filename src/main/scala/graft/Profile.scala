package graft
import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Scratch profiling main (local iteration): time one registry query N times. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Registry.all.find(_.name.startsWith(name)).get
    q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (sys.env.contains("GRAFT_EXPLAIN")) q.run(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
