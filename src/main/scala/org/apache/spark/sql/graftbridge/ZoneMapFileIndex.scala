package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path
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
  */
class ZoneMapFileIndex(
    spark: SparkSession,
    leafFiles: Seq[Path],
    basePath: Path,
    prune: (Seq[Expression], Seq[String]) => Set[String])
  extends InMemoryFileIndex(spark, leafFiles,
    Map("basePath" -> basePath.toString), userSpecifiedSchema = None) {

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirs = super.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty) dirs
    else {
      val urls = dirs.flatMap(_.files.map(_.getPath.toString))
      val kept = prune(dataFilters, urls)
      dirs.map(pd => pd.copy(files = pd.files.filter(f =>
          kept.contains(f.getPath.toString))))
        .filter(_.files.nonEmpty)
    }
  }
}

object ZoneMapFileIndex {

  /** Assemble a DataFrame over `leafFiles` whose scans prune through
    * `prune`. Schema comes from the parquet footers + the directory
    * layout's partition columns, exactly like a plain parquet read.
    */
  def table(spark: SparkSession, leafFiles: Seq[Path], basePath: Path,
      prune: (Seq[Expression], Seq[String]) => Set[String]): DataFrame = {
    val index = new ZoneMapFileIndex(spark, leafFiles, basePath, prune)
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
