package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract: a Spark
  * DataFrame program plus (when SQL-expressible) a DuckDB oracle that must
  * hash-match it on the same parquet tables.
  *
  * Conventions that make the hash-compare deterministic (see builder notes):
  *  - every output column aliased identically on both sides;
  *  - a total ORDER BY on both sides;
  *  - double aggregates either summed exactly via DECIMAL(18,4) then cast
  *    back to double, or rounded to 4 dp where magnitudes are small;
  *  - engine-portable hashing only (md5 over explicit strings/bytes).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Shared aggregation builders with engine-portable exact semantics. */
object Agg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Exact, portable, fast sum of a 2-decimal money column: scale to cent
    * longs (`floor(x*100 + 0.5)` — 2-dec values sit ~1e-9 from an integer
    * after ×100, so both engines land on the same cent), sum as long
    * (codegen'd, no BigDecimal boxing — ~3× faster than a decimal sum),
    * unscale to double. Overflow-safe to ~1.8e11 rows at |x| ≤ 5e5; sums
    * needing more headroom (multi-factor products with 4-6 decimals) use
    * exact DECIMAL arithmetic instead (CoreQueries.discPrice/charge).
    */
  def moneySum(c: Column): Column =
    sum(floor(c * 100 + 0.5).cast("long")).cast("double") / 100
  def moneySumSql(e: String): String =
    s"CAST(SUM(CAST(FLOOR(($e) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100"

  /** 4-decimal variant for exact products of two 2-dec factors (e.g.
    * price·(1−disc)). Scaled headroom is 1e4 smaller than [[moneySum]], so
    * reserve it for HIGH-cardinality groupings where per-group row counts
    * stay modest (per-order, per-user); giant low-cardinality groups use
    * exact DECIMAL instead (CoreQueries.discPrice).
    */
  def money4Sum(c: Column): Column =
    sum(floor(c * 10000 + 0.5).cast("long")).cast("double") / 10000
  def money4SumSql(e: String): String =
    s"CAST(SUM(CAST(FLOOR(($e) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000"
}

object Registry {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has ONE writer shape since the r8 regeneration: the
      // driver's testdata carries TIMESTAMP(MICROS, isAdjustedToUTC=false)
      // (reads as TimestampNTZ) and ScaleData-written copies mirror it.
      // Normalize to session-zone TimestampType micros — sessions run UTC,
      // so the NTZ cast is value-preserving — the one type every
      // downstream query and oracle assumes. No session conf is touched.
      // Pre-r7 instances carried raw int64 nanos; that reader branch is
      // gone — fail fast with the regeneration recipe instead of silently
      // flowing a Long ts into every timestamp query.
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => df
        case other => throw new IllegalArgumentException(
          s"events.ts in $dir has unsupported type ${other.simpleString}: " +
            "pre-r7 int64-nanos instances must be regenerated " +
            "(runMain graft.tools.ScaleData <srcDir> <dstDir> <K>)")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Stage a deterministic projection of a source table to parquet ONCE per
    * JVM (keyed by sfDir + table + projection), for streaming queries that
    * need a file-stream source directory. The staged bytes are a pure
    * function of the key, so re-staging per run would only bill identical
    * harness I/O to the measured operator; checkpoints/sinks stay per-run.
    */
  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def stageTable(spark: SparkSession, dir: String, name: String, cols: Seq[String]): String =
    staged.computeIfAbsent(s"$dir/$name/${cols.mkString(",")}", { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft-staged-")
      out.toFile.deleteOnExit()
      val path = s"$out/$name"
      tbl(spark, dir, name).select(cols.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Query-local temp dir, removed RECURSIVELY at JVM exit (a bare
    * `deleteOnExit` only removes empty dirs, so staged corpora would
    * accumulate across bench/verify runs).
    */
  private val tmpDirs = java.util.Collections.synchronizedList(
    new java.util.ArrayList[java.io.File]())
  private lazy val cleanupHook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() =>
    tmpDirs.forEach { d =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      try rm(d) catch { case _: Throwable => () }
    }))
  def tmpDir(prefix: String): String = {
    cleanupHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs.add(p.toFile)
    p.toString
  }

  /** Stage `df` as ONE parquet file named `name.parquet` under `srcDir`
    * with a pinned mtime — file-stream sources order batches by mtime, so
    * staged files arrive as deterministic micro-batches under
    * `maxFilesPerTrigger=1` (the arrival-order harness of the
    * accumulating-index queries).
    */
  def stageOrderedFile(df: org.apache.spark.sql.DataFrame, srcDir: String,
      name: String, mtime: Long): Unit = {
    val t = tmpDir("graft-stage-")
    df.coalesce(1).write.mode("overwrite").parquet(t)
    val part = new java.io.File(t).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(srcDir, s"$name.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(mtime))
  }

  lazy val all: Seq[Q] =
    CoreQueries.qs ++ MoreQueries.qs ++ CdcQueries.qs ++ TextQueries.qs ++
      VectorQueries.qs ++ StreamQueries.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
