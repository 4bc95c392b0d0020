package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Catalog registration — the Glue-crawler role (SURVEY.md §2.6 C1-C3):
  * register the delivered lake as a partitioned external table and keep
  * partitions discovered as batches land.
  */
object LakeCatalog {

  /** C1: schema inference + table registration over a delivered lake dir.
    * Uses the files' own footer schema (crawler-style inference); partition
    * columns are discovered from the Hive layout.
    *
    * For lakes written by the streaming file sink, Spark resolves the
    * location through the `_spark_metadata` commit log even via the catalog
    * table (orphan/uncommitted files stay invisible — pinned by
    * DeliverSpec); the PARTITIONED BY clause is ignored for such locations
    * and pruning comes from the log's partitioning-aware file index.
    */
  def registerLake(spark: SparkSession, table: String, lakeDir: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val df = spark.read.parquet(lakeDir)
    // partition columns come from the lake's ACTUAL directory layout (what
    // Spark's partition discovery found), in layout order — hardcoding
    // year/month/day/hour would misregister a routeByTable lake, whose
    // leading `table=` dir must be a partition column or MSCK finds nothing
    val discovered = {
      val fs = new org.apache.hadoop.fs.Path(lakeDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def firstLeafChain(p: org.apache.hadoop.fs.Path): Seq[String] = {
        val kids = fs.listStatus(p).filter(st =>
          st.isDirectory && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
        // pick the first PARTITION child (`k=v`), not merely the first
        // listed child — a stray non-partition dir sitting beside the
        // partition dirs must not end discovery early and silently
        // register the table unpartitioned
        kids.find(_.getPath.getName.contains("=")) match {
          case Some(k) =>
            k.getPath.getName.split("=", 2)(0) +: firstLeafChain(k.getPath)
          case _ => Seq.empty
        }
      }
      firstLeafChain(new org.apache.hadoop.fs.Path(lakeDir))
    }
    val schema = df.schema
    val partCols = discovered.flatMap(n => schema.fields.find(_.name == n))
    val dataCols = schema.fields.filterNot(f => discovered.contains(f.name))
    val colsDdl = (dataCols ++ partCols)
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    if (partCols.isEmpty) {
      spark.sql(
        s"""CREATE TABLE $table ($colsDdl)
           |USING parquet
           |LOCATION '$lakeDir'""".stripMargin)
    } else {
      spark.sql(
        s"""CREATE TABLE $table ($colsDdl)
           |USING parquet
           |PARTITIONED BY (${partCols.map(_.name).mkString(", ")})
           |LOCATION '$lakeDir'""".stripMargin)
      refreshPartitions(spark, table)
    }
  }

  /** C2: incremental partition registration (`MSCK REPAIR` ≙ crawler pass).
    *
    * When the lake was written by the streaming file sink, its
    * `_spark_metadata` transaction log takes over both visibility and
    * partition discovery (the catalog then records no partition columns —
    * Spark resolves the location through `MetadataLogFileIndex`, which is
    * partitioning-aware). MSCK is unsupported and unneeded in that case:
    * the commit log *is* the crawler.
    */
  def refreshPartitions(spark: SparkSession, table: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    if (meta.partitionColumnNames.nonEmpty)
      spark.sql(s"MSCK REPAIR TABLE $table")
  }

  /** C3: event-driven refresh — a listener that re-crawls after every
    * committed micro-batch (the EventBridge → crawler trigger,
    * README.md:524-549).
    */
  def eventDrivenRefresh(spark: SparkSession, table: String,
      onlyQueryId: Option[java.util.UUID] = None): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        // scope to the DELIVERY query when given: MSCK is O(lake listing),
        // and a session running unrelated streams (alerts, pushes) must
        // not pay it once per every stream's micro-batch
        if (e.progress.numInputRows > 0 &&
            onlyQueryId.forall(_ == e.progress.id))
          refreshPartitions(spark, table)
    }
    spark.streams.addListener(l)
    l
  }

  /** Register a manifest lake as a SQL view whose scans prune through the
    * `_zonemaps` sidecar (and parquet blooms when `blooms`): the
    * zone-map-aware twin of [[registerLake]] for lakes with a manifest —
    * SQL gets exactly-once manifest visibility AND file skipping, with
    * Catalyst deriving the filters per query (see
    * [[graft.sources.ManifestReader.asTable]]). Re-register after new
    * deliveries to pick up the latest chain (views snapshot the file set,
    * matching the manifest reader's read-committed semantics).
    */
  def registerPrunedView(spark: SparkSession, view: String,
      manifestDir: String, blooms: Boolean = false): Unit =
    graft.sources.ManifestReader.asTable(spark, manifestDir, blooms)
      .createOrReplaceTempView(view)
}
