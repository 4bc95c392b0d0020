package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter build/probe over Catalyst's native sketch expressions —
  * the same machinery Spark's runtime row-filter injection uses, exposed
  * as columns so an operator can build a set-membership sketch
  * DISTRIBUTED (partial sketches OR-merge at the final agg; the driver
  * never sees the member rows) and probe it map-side with zero shuffle of
  * the probing table.
  *
  * Values are bridged through `xxhash64` on both build and probe, so any
  * input type works and both sides hash identically. A bloom answer is
  * "definitely absent" or "maybe present" — callers must treat a hit as a
  * CANDIDATE and verify exactly (no false negatives ⇒ prefilter + exact
  * verify ≡ exact answer).
  */
object BloomFunctions {

  /** Aggregate a column into a serialized bloom filter (binary), sized for
    * `expectedItems` members at `fpp` false-positive rate
    * (bits = -n·ln p / ln²2, the standard optimum).
    */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.001): Column = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // BloomFilterAggregate silently CLAMPS to the runtime-filter session
    // caps — a 2^28-item request would come back as a 4M-item sketch whose
    // real FP rate approaches 1, degrading the prefilter to a no-op with
    // no error. Fail fast and tell the caller which knobs to raise.
    val spark = org.apache.spark.sql.SparkSession.active
    val maxItems = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4194304").toLong
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom sketch for $expectedItems items at fpp=$fpp needs $numBits bits, but the " +
        s"session caps are maxNumItems=$maxItems / maxNumBits=$maxBits and Spark would " +
        "silently clamp (FP rate → 1). Raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits to match.")
    ColumnBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe against a [[bloomAgg]] sketch column. */
  def mightContain(bloom: Column, c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      new XxHash64(Seq(ColumnBridge.expression(c)))))
}
