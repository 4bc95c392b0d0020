package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.IndexErase

/** Scale-gate tool: measure erasure propagation into a persisted IVF index
  * at a scaled instance — wall for locate+rewrite, fraction of files
  * actually rewritten (the claim: cost ∝ AFFECTED files, not index size),
  * bytes-gone verification, and post-erase serve recall vs brute force
  * over the survivors.
  *
  * Usage: runMain graft.tools.EraseScale <sfDir> [erasePermille]
  */
object EraseScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val permille = if (args.length > 1) args(1).toInt else 10
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
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpus = emb.where(col("vec_id") >= 100)
      .select(col("vec_id").as("id"), col("embedding"))
    val n = corpus.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-erasescale-")
      .toString + "/index"

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, buildWall) = timed(Similarity.buildIvfIndex(corpus, dir, nlist = 0))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val filesBefore = graft.streaming.FsOps.walkParquet(fs,
      new org.apache.hadoop.fs.Path(s"$dir/corpus"), skipHidden = true).size

    // erase `permille`/1000 of the ids, hash-drawn (spread across cells —
    // the worst case for the affected-file count); permille = 0 = the
    // SELECTIVE case (5 ids — a typical GDPR request batch), which must
    // open only the files that hold them
    val erased =
      if (permille == 0) corpus.orderBy(col("id")).limit(5).select(col("id"))
      else corpus.where(pmod(xxhash64(col("id")), lit(1000)) < permille)
        .select(col("id"))
    val nErased = erased.count()
    val (report, eraseWall) = timed(IndexErase.eraseFromIvfIndex(spark, dir, erased))

    // bytes gone (raw read, not serve-filtered)
    val leftover = spark.read.parquet(s"$dir/corpus")
      .join(erased.withColumnRenamed("id", "nid"), Seq("nid"), "left_semi").count()
    require(leftover == 0, s"bytes-gone violated: $leftover erased rows remain")

    // post-erase serve recall vs brute force over survivors (nprobe = 4,
    // the measured serving configuration)
    val kept = corpus.join(erased, Seq("id"), "left_anti")
    val exact = Similarity.bruteForceKnn(queries, kept, k = 5)
      .select(col("qid"), col("nid")).localCheckpoint()
    val approx = Similarity.ivfIndexQuery(queries, dir, k = 5, nprobe = 4)
      .select(col("qid"), col("nid"))
    val hits = approx.join(exact, Seq("qid", "nid"), "left_semi").count()
    val servedErased = approx
      .join(erased.withColumnRenamed("id", "nid"), Seq("nid"), "left_semi").count()
    require(servedErased == 0, s"serve returned $servedErased erased ids")
    val recall = hits.toDouble / exact.count()

    println(f"""{"sf":"$sfDir","n_corpus":$n,"n_erased":$nErased,""" +
      f""""build":$buildWall%.2f,"erase":$eraseWall%.2f,""" +
      f""""files_retired":${report.retired},"files_written":${report.written},""" +
      f""""files_before":$filesBefore,"recall_after":$recall%.4f,""" +
      f""""bytes_gone":true,"no_erased_served":true}""")

    // ---- UPSERT time-travel erasure at scale (r14): a CDC table with 3
    // retained commits; erase a subject set; the claim is cost ∝ affected
    // bucket VERSIONS (locate is one column-pruned scan over retained
    // versions), with history ids preserved and the bytes verifiably gone
    // from every retained version.
    val eventsPath = new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet")
    if (eventsPath.getFileSystem(spark.sessionState.newHadoopConf())
        .exists(eventsPath)) {
      import graft.streaming.UpsertSink
      val events = spark.read.parquet(s"$sfDir/events.parquet")
      val changes = events.select(
        col("user_id").as("id"), col("value"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_id").as("seq"))
      val table = java.nio.file.Files.createTempDirectory("graft-erasescale-up-")
        .toString + "/table"
      val nBuckets = UpsertSink.nBucketsFor(
        events.count() * 64, targetBucketBytes = 4L << 20) // small buckets at test SF
      val (_, upBuildWall) = timed {
        (0 to 2).foreach { b =>
          UpsertSink.applyBatch(changes.where(pmod(col("seq"), lit(3)) === b),
            b.toLong, table, "id", "op", Seq("seq"), nBuckets = nBuckets,
            retainCommits = 3)
        }
      }
      val subjects =
        if (permille == 0) changes.select(col("id")).distinct().orderBy(col("id"))
          .limit(5)
        else changes.select(col("id")).distinct()
          .where(pmod(xxhash64(col("id")), lit(1000)) < permille)
      val nSubjects = subjects.count()
      val versionsBefore = UpsertSink.commitHistory(table)
        .flatMap(_.versions.toSeq).distinct.size
      val (upStats, upWall) = timed(
        UpsertSink.eraseKeys(spark, table, "id", subjects))
      val raw = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$table/buckets")
        .join(subjects, Seq("id"), "left_semi").count()
      require(raw == 0, s"upsert bytes-gone violated: $raw rows remain")
      val hist = UpsertSink.commitHistory(table).map(_.batchId)
      require(hist == Seq(0L, 1L, 2L), s"history ids changed: $hist")
      println(f"""UPSERT {"sf":"$sfDir","n_subjects":$nSubjects,""" +
        f""""n_buckets":$nBuckets,"versions_before":$versionsBefore,""" +
        f""""versions_rewritten":${upStats.versionsRewritten},""" +
        f""""versions_dropped":${upStats.versionsDropped},""" +
        f""""commits_rewritten":${upStats.commitsRewritten},""" +
        f""""build":$upBuildWall%.1f,"erase":$upWall%.1f,""" +
        f""""bytes_gone":true,"history_intact":true}""")
    }
    spark.stop()
  }
}
