package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** A [[org.apache.spark.sql.execution.datasources.FileIndex]] that applies
  * caller-supplied file pruning (zone maps / bloom filters) INSIDE Spark's
  * scan planning — the idiomatic extension point (Delta's TahoeFileIndex
  * shape): Catalyst hands `listFiles` the resolved data filters it already
  * extracted, the index answers with fewer files, and every consumer
  * (DataFrame ops, SQL, joins, AQE) benefits with no special read API.
  * Lives in the spark.sql package tree because the V1 datasource surface
  * is `private[sql]` — the standard posture for extension libraries.
  *
  * `prune(dataFilters, urls) => kept` must be CONSERVATIVE: it may drop a
  * file only when the filters provably match no row of it. Partition
  * pruning is not its job — the parent [[InMemoryFileIndex]] already
  * handles `partitionFilters` from the directory layout.
  *
  * `resolve` (optional) makes the FILE SET LIVE: called per `listFiles`,
  * it returns Some((files, commit)) when the backing table grew/changed
  * (the caller owns the change check — typically a manifest-chain
  * signature) and None when unchanged. On change, an inner index over the
  * new list replaces the registration-time listing, so a registered view
  * keeps seeing post-registration flushes; `commit` runs only AFTER the
  * new index installs successfully, so a failed refresh (listing error,
  * layout change) is retried on the next scan instead of being consumed
  * as seen. The DATA schema stays frozen at registration (normal table
  * semantics); a resolve that changes the PARTITION layout is refused
  * loudly rather than mis-read.
  */
class ZoneMapFileIndex(
    spark: SparkSession,
    leafFiles: Seq[Path],
    basePath: Path,
    prune: (Seq[Expression], Seq[String]) => Set[String],
    resolve: Option[() => Option[(Seq[Path], () => Unit)]] = None)
  extends InMemoryFileIndex(spark, leafFiles,
    Map("basePath" -> basePath.toString), userSpecifiedSchema = None) {

  // the live delegate after the first post-registration change; this index
  // itself serves until then
  @volatile private var live: Option[InMemoryFileIndex] = None

  // registration-time partition layout (super access is illegal inside the
  // closures below; a plain val capture is not)
  private val frozenPartitionSchema = super.partitionSchema

  // one refresh at a time: listFiles/allFiles/inputFiles/sizeInBytes can
  // be hit by concurrent scans of one registered view, and an unguarded
  // refresh would have each of them re-parse the manifest and build a
  // duplicate InMemoryFileIndex (redundant file-listing jobs, interleaved
  // live installs). The resolve() change check is one FS listing — cheap
  // enough to serialize.
  private val refreshLock = new Object
  private def refreshIfChanged(): Unit = refreshLock.synchronized {
    resolve.foreach { r =>
      r().foreach { case (files, commit) =>
        val idx = new InMemoryFileIndex(spark, files,
          Map("basePath" -> basePath.toString), userSpecifiedSchema = None)
        require(idx.partitionSchema.sameType(frozenPartitionSchema),
          s"manifest file set under $basePath changed its PARTITION layout " +
            s"(${frozenPartitionSchema.simpleString} -> " +
            s"${idx.partitionSchema.simpleString}) after registration — " +
            "re-register the view; a frozen-schema table cannot follow a " +
            "layout change")
        live = Some(idx)
        commit() // only now is the change consumed
      }
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    refreshIfChanged()
    val dirs = live match {
      case Some(idx) => idx.listFiles(partitionFilters, dataFilters)
      case None => super.listFiles(partitionFilters, dataFilters)
    }
    if (dataFilters.isEmpty) dirs
    else {
      val urls = dirs.flatMap(_.files.map(_.getPath.toString))
      val kept = prune(dataFilters, urls)
      dirs.map(pd => pd.copy(files = pd.files.filter(f =>
          kept.contains(f.getPath.toString))))
        .filter(_.files.nonEmpty)
    }
  }

  override def allFiles(): Seq[FileStatus] = {
    refreshIfChanged()
    live match {
      case Some(idx) => idx.allFiles()
      case None => super.allFiles()
    }
  }

  override def inputFiles: Array[String] = {
    refreshIfChanged()
    live match {
      case Some(idx) => idx.inputFiles
      case None => super.inputFiles
    }
  }

  // join-strategy sizing must track the LIVE set, or a grown lake keeps
  // getting broadcast at its registration-time size — and Catalyst reads
  // stats BEFORE any listFiles runs, so the refresh must happen here too
  override def sizeInBytes: Long = {
    refreshIfChanged()
    live match {
      case Some(idx) => idx.sizeInBytes
      case None => super.sizeInBytes
    }
  }

  override def refresh(): Unit = {
    refreshIfChanged()
    live match {
      case Some(idx) => idx.refresh()
      case None => super.refresh()
    }
  }
}

object ZoneMapFileIndex {

  /** Assemble a DataFrame over `leafFiles` whose scans prune through
    * `prune`. Schema comes from the parquet footers + the directory
    * layout's partition columns, exactly like a plain parquet read.
    * `resolve` (optional) keeps the file set live — see the class doc.
    */
  def table(spark: SparkSession, leafFiles: Seq[Path], basePath: Path,
      prune: (Seq[Expression], Seq[String]) => Set[String],
      resolve: Option[() => Option[(Seq[Path], () => Unit)]] = None): DataFrame = {
    val index = new ZoneMapFileIndex(spark, leafFiles, basePath, prune, resolve)
    val format = new ParquetFileFormat
    val dataSchema = format.inferSchema(spark, Map.empty,
      index.allFiles()).getOrElse(
        throw new IllegalArgumentException(
          s"could not infer a parquet schema under $basePath"))
    val relation = HadoopFsRelation(index, index.partitionSchema, dataSchema,
      bucketSpec = None, format,
      options = Map("basePath" -> basePath.toString))(spark)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation)
  }
}
