package graft
import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Scratch profiling main (local iteration): time one registry query N times.
  * GRAFT_JOBS=1 additionally prints every Spark job of the LAST run with its
  * wall time and call site, attributing multi-job queries (quantizer fits,
  * counts, checkpoints) to their source lines. GRAFT_EXPLAIN=1 prints the
  * formatted physical plan.
  */
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

    // per-job wall-clock attribution: jobId -> (callSite, submitted, completed)
    final case class J(site: String, var start: Long = 0L, var end: Long = 0L,
      var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val record = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (record.get) {
          val site = Option(e.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")
          jobs.put(e.jobId, J(site, e.time))
          ()
        }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        // attribute tasks to the newest open job (approximate; fine for
        // sequential actions, which is what the query paths run)
        ()
      }
    })

    name.split(',').foreach { nm =>
      val q = Registry.all.find(_.name.startsWith(nm)).get
      q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      (1 to n).foreach { i =>
        if (i == n && sys.env.contains("GRAFT_JOBS")) { jobs.clear(); record.set(true) }
        System.gc()
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[profile] ${q.name} run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (sys.env.contains("GRAFT_JOBS")) {
        record.set(false)
        org.apache.spark.graftbridge.ListenerBridge.flushListeners(spark.sparkContext)
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toSeq.sortBy(_._1)
        var prevEnd = 0L
        js.foreach { case (id, j) =>
          val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1e3
          prevEnd = j.end
          println(f"[job] #$id%-4d ${(j.end - j.start) / 1e3}%7.3fs  gap ${gap}%6.3fs  ${j.site}")
        }
        println(f"[job] total job time ${js.map(j => j._2.end - j._2.start).sum / 1e3}%.3fs over ${js.size} jobs")
      }
      if (sys.env.contains("GRAFT_EXPLAIN")) q.run(spark, sfDir).explain("formatted")
      if (sys.env.contains("GRAFT_PLANTIME")) (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        val df = q.run(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        println(f"[plan] ${q.name}: build ${(t1 - t0) / 1e9}%.3f s, " +
          f"analyze+optimize+plan ${(System.nanoTime() - t1) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
