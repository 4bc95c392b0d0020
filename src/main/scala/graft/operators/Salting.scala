package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T11 hot-key salting (README.md:84-86: `table=orders||random(1000)` —
  * spread a hot partition key over N sub-keys, trading per-key order for
  * balance). On Spark, AQE's skew handling covers most shuffle skew; salting
  * remains the tool for (a) skewed *aggregations* (two-phase partial) and
  * (b) skewed stream partition keys at ingest.
  *
  * Salt derivation is deterministic (hash of a tiebreak column, not rand())
  * so retries and replays stay idempotent — the same record always lands in
  * the same sub-key.
  */
object Salting {

  /** Append a salted key column `keyCol||salt` with `buckets` sub-keys.
    * `concat_ws` (not `concat`) so a NULL key still salts: plain concat
    * returns NULL for every null-key row, collapsing the most common hot
    * key of all — NULL — back into a single reducer.
    */
  def withSaltedKey(df: DataFrame, keyCol: Column, tiebreak: Column,
      buckets: Int, saltedName: String = "salted_key"): DataFrame =
    df.withColumn(saltedName,
      concat_ws("||", keyCol.cast("string"),
        pmod(hash(tiebreak), lit(buckets)).cast("string")))

  /** Hot-key detection — the monitoring half of the salting loop: keys
    * whose record share exceeds `minShare` (and at least `minCount` rows)
    * are the ones worth salting. One partial-aggregated key count (map-side
    * combine ships one row per key per partition, never records) + a
    * broadcast-scalar total; output (key, n, share) sorted hottest-first.
    */
  def detectHotKeys(df: DataFrame, keyCol: Column, minShare: Double,
      minCount: Long = 0L): DataFrame = {
    val counts = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("n") / col("__total"))
      .where(col("share") >= minShare && col("n") >= minCount)
      .drop("__total")
      .orderBy(col("n").desc, col("key"))
  }

  /** Two-phase aggregation over a skewed key: partial aggregate on the
    * salted key (spreads a hot key over `buckets` reducers), then final
    * aggregate on the true key. `partials` map output column names to
    * partial aggregates; `finals` recombine them (sum→sum, count→sum,
    * min→min, max→max...).
    */
  def saltedAgg(df: DataFrame, keyCol: Column, tiebreak: Column, buckets: Int,
      partials: Map[String, Column], finals: Map[String, Column]): DataFrame = {
    val salted = withSaltedKey(df, keyCol, tiebreak, buckets)
      .withColumn("__true_key", keyCol)
    val phase1 = salted.groupBy(col("salted_key"), col("__true_key"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    phase1.groupBy(col("__true_key").as("key"))
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
  }
}
