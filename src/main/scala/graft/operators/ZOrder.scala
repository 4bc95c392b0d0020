package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ZOrderFunctions._

/** Z-order (Morton-curve) clustering: lay a table out so file-level min/max
  * ranges stay tight on EVERY clustered column simultaneously. A 1-D sort
  * ([[graft.streaming.Compact]]'s `sortBy`) buys pruning on its leading
  * column only; interleaving quantile-bucket bits makes a predicate on ANY
  * clustered column prune ~n^((d-1)/d) of n files — the Delta/Iceberg
  * OPTIMIZE ZORDER idea, here as three codegen'd expressions plus
  * `repartitionByRange`.
  *
  * Cost model (matters at 100 TB): one quantile-sketch pass to learn the
  * per-column cut points, repartitionByRange's own range-boundary sampling
  * pass, then the single full shuffle+write every clustering rewrite pays
  * anyway. Buckets are equal-population (quantiles, not value ranges), so
  * skew in any column cannot collapse the curve into few cells.
  */
object ZOrder {

  /** The z-value column for `cols` of `df`: per-column equal-population
    * bucket ids (2^bits buckets, cut points from ONE multi-column
    * approxQuantile pass) bit-interleaved into a long. NULL values bucket
    * to 0 (cluster at z-min). Strings ride a 6-byte big-endian prefix
    * proxy whose order matches parquet's binary min/max order.
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 12): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 63, s"${cols.size} cols * $bits bits > 63")
    val derived = cols.map(c => toDoubleProxy(df.schema(c).dataType, col(c), c))
    val nB = 1 << bits
    val probs = (1 until nB).map(_.toDouble / nB).toArray
    // one pass, all columns; sketch error of a fraction of one bucket keeps
    // boundaries honest without a second scan
    val prep = df.select(derived.zipWithIndex.map { case (c, i) => c.as(s"__zd$i") }: _*)
    // raw cuts, duplicates KEPT: a heavy value owns its share of cut
    // positions, which is what spreads low-cardinality/skewed columns over
    // the full bucket range (see Boundaries.bucket)
    val cuts = prep.stat.approxQuantile(
      cols.indices.map(i => s"__zd$i").toArray, probs, 0.25 / nB)
    val buckets = derived.zip(cuts).map { case (c, b) =>
      coalesce(quantileBucket(c, b), lit(0))
    }
    interleaveBits(array(buckets: _*), bits, cols.size)
  }

  /** Rewrite `df` into `outDir` as `nFiles` z-clustered parquet files:
    * ranges of the z curve map 1:1 to files, so every clustered column's
    * per-file min/max spans ~1/2^(bits/d) of its value space.
    */
  def cluster(df: DataFrame, cols: Seq[String], outDir: String, nFiles: Int,
      bits: Int = 12): Unit = {
    val z = zValue(df, cols, bits)
    // INT64 timestamps, scoped: a clustered rewrite exists to be zone-map
    // pruned, and INT96 (the session default) carries no min/max stats
    graft.streaming.Deliver.withInt64Timestamps(df.sparkSession) {
      df.withColumn("__z", z)
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z") // projection after the sort keeps per-partition order
        .write.mode("overwrite").option("compression", "snappy")
        .parquet(outDir)
    }
  }

  /** Double proxy preserving each type's order: numerics/timestamps cast,
    * dates as epoch days, strings via the 48-bit prefix (exact in a
    * double), booleans 0/1. Unsupported types are a loud error — silently
    * hash-bucketing would destroy the range locality callers paid for.
    */
  private def toDoubleProxy(dt: DataType, c: Column, name: String): Column = dt match {
    case _: NumericType => c.cast(DoubleType)
    case DateType => datediff(c, to_date(lit("1970-01-01"))).cast(DoubleType)
    case TimestampType | TimestampNTZType => c.cast(DoubleType)
    case StringType => stringPrefixLong(c).cast(DoubleType)
    case BooleanType => c.cast(IntegerType).cast(DoubleType)
    case other => throw new IllegalArgumentException(
      s"zValue: no order-preserving double proxy for column '$name' of type $other")
  }

}
