package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** 32-bit SimHash near-duplicate fingerprinting.
  *
  * Per token: take the first 8 hex chars of md5(token) as a 32-bit value;
  * each bit votes ±1; the sign of each bit's vote sum forms the fingerprint.
  * Near-duplicate docs differ in few bits (small Hamming distance).
  *
  * The bit math is done digit-wise on the md5 hex string with portable
  * arithmetic (no engine-specific bit ops), so the DuckDB oracle reproduces
  * fingerprints exactly. All expressions codegen; the only shuffles are the
  * two aggregations keyed by (id, bit) and (id).
  */
object SimHash {

  val Bits = 32
  private val hexDigits = "0123456789abcdef".split("").toSeq

  /** Value 0-15 of hex digit character `c`. */
  private def hexVal(c: Column): Column =
    (array_position(typedLit(hexDigits), c) - 1).cast("int")

  /** Per-(doc, bit) table of token-hash bits: (id, bitpos, bit). */
  def bitVotes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val h8 = substring(md5(col("tok").cast("binary")), 1, 8)
    val withBits = toks
      .select(col("id"), h8.as("h8"), explode(sequence(lit(0), lit(Bits - 1))).as("bitpos"))
    // hex digit index from the left (1-based): bit 31..28 live in digit 1, etc.
    val digitPos = (lit(8) - floor(col("bitpos") / 4)).cast("int")
    val dv = hexVal(col("h8").substr(digitPos, lit(1)))
    val pow2 = when(col("bitpos") % 4 === 0, 1)
      .when(col("bitpos") % 4 === 1, 2)
      .when(col("bitpos") % 4 === 2, 4).otherwise(8)
    withBits.select(col("id"), col("bitpos"),
      (floor(dv / pow2).cast("long") % 2).as("bit"))
  }

  /** Majority vote per bit: (id, bitpos, simbit). TOTAL over the input
    * docs: a doc with zero tokens (empty/punctuation-only/NULL text) gets
    * all-zero bits (simhash 0) instead of silently vanishing from the
    * output — a downstream pair lookup must find every requested doc.
    */
  def fingerprintBits(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val votes = bitVotes(docs, idCol, textCol)
      .groupBy(col("id"), col("bitpos"))
      .agg(sum(col("bit") * 2 - 1).as("vote"))
    docs.select(col(idCol).as("id")).distinct()
      .select(col("id"), explode(sequence(lit(0), lit(Bits - 1))).as("bitpos"))
      .join(votes, Seq("id", "bitpos"), "left") // missing vote (no tokens) → 0 bit
      .select(col("id"), col("bitpos"), when(col("vote") > 0, 1L).otherwise(0L).as("simbit"))
  }

  /** Final 32-bit fingerprint as a long: (id, simhash). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    fingerprintBits(docs, idCol, textCol)
      .groupBy(col("id"))
      .agg(sum(col("simbit").cast("double") * pow(lit(2.0), col("bitpos"))).cast("long").as("simhash"))

  /** Hamming distance for explicit id pairs, computed from the bit table
    * (portable: no xor/popcount dependence). `pairs`: (id_a, id_b).
    */
  def hammingOnPairs(pairs: DataFrame, bits: DataFrame): DataFrame = {
    val a = bits.select(col("id").as("id_a"), col("bitpos"), col("simbit").as("bit_a"))
    val b = bits.select(col("id").as("id_b"), col("bitpos"), col("simbit").as("bit_b"))
    pairs.join(a, Seq("id_a")).join(b, Seq("id_b", "bitpos"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(when(col("bit_a") =!= col("bit_b"), 1L).otherwise(0L)).as("hamming"))
  }
}
