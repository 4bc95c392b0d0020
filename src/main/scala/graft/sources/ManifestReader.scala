package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7 manifest-driven scan (README.md:291-303, 451-456): read ONLY the files
  * listed in the newest manifest — "never the folder" — so torn writes and
  * orphan files are invisible and re-delivered batches can't double-count.
  * The portable twin of the sink's `_spark_metadata` log for readers outside
  * Spark (the reference's Redshift `COPY ... FROM manifest`).
  */
object ManifestReader {

  /** Parse a manifest directory and return the file list of the latest
    * manifest (manifests are cumulative snapshots, numbered per batch).
    */
  def latestManifestFiles(spark: SparkSession, manifestDir: String): Seq[String] = {
    val files = Option(new java.io.File(manifestDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("manifest-")).sortBy(_.getName)
    files.lastOption.toSeq.flatMap { f =>
      spark.read.option("multiLine", true).json(f.getPath)
        .select(explode(col("entries")).as("e"))
        .select(col("e.url")).collect().map(_.getString(0)).toSeq
    }
  }

  /** Scan exactly the manifest-listed files (duplicate-proof, torn-write-proof). */
  def read(spark: SparkSession, manifestDir: String): DataFrame = {
    val files = latestManifestFiles(spark, manifestDir)
    require(files.nonEmpty, s"no manifest in $manifestDir")
    // basePath preserves the Hive partition columns of the listed files:
    // strip from the FIRST `name=value` path segment (handles both
    // year=.../... and table=.../year=.../... layouts). Unpartitioned
    // manifests (no name=value segment anywhere) fall back to the files'
    // common parent directory — basePath must be an ancestor DIRECTORY, and
    // the unstripped first entry would be a data-file path Spark rejects.
    val stripped = files.head.replaceAll("/[^/=]+=[^/]*(/.*)?$", "")
    val base =
      if (stripped != files.head) stripped
      else files
        .map(_.split('/').dropRight(1).toSeq) // parent dir segments
        .reduce((a, b) => a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1))
        .mkString("/")
    spark.read.option("basePath", base).parquet(files: _*)
  }
}
