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

object Registry {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet carries TIMESTAMP(NANOS) — Spark's reader rejects it.
      // Read nanos as long and truncate to micros (integer div), matching
      // DuckDB's truncating ns→us read of the same file.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  lazy val all: Seq[Q] =
    CoreQueries.qs ++ MoreQueries.qs ++ CdcQueries.qs ++ TextQueries.qs ++
      VectorQueries.qs ++ StreamQueries.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
