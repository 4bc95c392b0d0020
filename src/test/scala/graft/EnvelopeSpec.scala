package graft

import org.apache.spark.sql.functions._
import graft.codec.Envelope
import graft.model.CdcEnvelope

/** Codec unit tests (T1-T4, T9, T10): roundtrip, corrupt-record routing,
  * partition derivation — the Lambda-transform contract (README.md:137-156).
  */
class EnvelopeSpec extends SparkSuite {
  import spark.implicits._

  test("encode/decode roundtrip preserves envelope fields") {
    val df = Seq((98765L, "shipped", "U")).toDF("id", "status", "op")
    val wire = Envelope.encode(struct(
      struct($"id", $"status").as("data"), struct($"op").as("metadata")))
    val out = df.select(Envelope.decode(wire, CdcEnvelope.ordersSchema).as("env"))
      .select($"env.data.id", $"env.data.status", $"env.metadata.op")
      .as[(Long, String, String)].head()
    assert(out == ((98765L, "shipped", "U")))
  }

  test("malformed payloads route to the error side, valid to ok (T10)") {
    val good = java.util.Base64.getEncoder.encodeToString(
      """{"data":{"id":1,"status":"new"},"metadata":{"op":"I"}}""".getBytes)
    val badJson = java.util.Base64.getEncoder.encodeToString("not json".getBytes)
    val df = Seq(good, badJson, "!!!not-base64!!!").toDF("wire")
      .withColumn("env", Envelope.decode($"wire", CdcEnvelope.ordersSchema))
    val (ok, failed) = Envelope.routeErrors(df, $"env", $"env.data.id")
    assert(ok.count() == 1 && failed.count() == 2)
    assert(ok.select($"env.data.id").as[Long].head() == 1L)
  }

  test("time partition derivation matches the !{timestamp:...} template (T9)") {
    val df = Seq(java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13")).toDF("ts")
    val row = Envelope.withTimePartitions(df, $"ts")
      .select($"year", $"month", $"day", $"hour").as[(Int, Int, Int, Int)].head()
    assert(row == ((2025, 11, 7, 14)))
  }

  test("fixed clock makes processed_at deterministic; default is wall-clock") {
    val clock = java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13")
    val df = Seq(1).toDF("x")
    val got = Envelope.withProcessedAt(df, Some(clock))
      .select($"processed_at").as[java.sql.Timestamp].head()
    assert(got == clock)
    assert(!Envelope.withProcessedAt(df, None).select($"processed_at").isEmpty)
  }
}
