package graft.codec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Wire-envelope codec: the reference's transform stage decodes base64,
  * parses the JSON CDC envelope, enriches with `processed_at`, and derives
  * time partition columns (README.md:137-149, 130, 145).
  *
  * All column-expression based (T1-T4, T9 in SURVEY.md §2.2) — the whole
  * decode path stays in WholeStageCodegen.
  */
object Envelope {

  /** T4+T1 encode: struct → JSON → base64 wire string. */
  def encode(payload: Column): Column = base64(to_json(payload).cast("binary"))

  /** T1+T2 decode: base64 wire string → JSON text → typed struct.
    * Malformed base64 or JSON yields null (routed by [[routeErrors]]) —
    * `try_to_binary` instead of `unbase64`, which throws on bad padding;
    * a poison record must reach the DLQ, not kill the stream (K4).
    */
  def decode(wire: Column, schema: StructType): Column =
    from_json(decodeText(wire), schema)

  /** Raw decoded JSON text (for ad-hoc `get_json_object` access). */
  def decodeText(wire: Column): Column =
    try_to_binary(wire, lit("base64")).cast("string")

  /** T3 enrichment: append `processed_at`. The reference stamps wall-clock
    * time (README.md:145); tests/oracles inject a fixed clock for
    * deterministic output.
    */
  def withProcessedAt(df: DataFrame, clock: Option[java.sql.Timestamp] = None): DataFrame =
    df.withColumn("processed_at", clock.map(lit(_).cast("timestamp")).getOrElse(current_timestamp()))

  /** T9: Hive-style time partition columns year/month/day/hour derived from
    * a timestamp column (README.md:130 `!{timestamp:yyyy}/…/{HH}`).
    */
  def withTimePartitions(df: DataFrame, ts: Column): DataFrame =
    df.withColumn("year", year(ts))
      .withColumn("month", month(ts))
      .withColumn("day", dayofmonth(ts))
      .withColumn("hour", hour(ts))

  /** T10: split a decoded frame into (ok, failed) the way the reference
    * routes `Ok` vs `ProcessingFailed` records (README.md:141, 156, 426).
    * A record fails when its decoded struct is null or misses the key field.
    */
  def routeErrors(df: DataFrame, decoded: Column, requiredField: Column): (DataFrame, DataFrame) = {
    val ok = decoded.isNotNull && requiredField.isNotNull
    (df.where(ok), df.where(!ok))
  }
}
