package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core record/envelope shapes of the reference pipeline.
  *
  * The reference (`/root/reference/README.md`) models a sharded, ordered,
  * replayable record log (README.md:43-53): records carry a partition key
  * (hashed to a shard, README.md:47), a per-shard monotone sequence number
  * (README.md:238 — 30 digits, exceeds int64, kept as String), an arrival
  * timestamp (README.md:247), and an opaque payload (base64 on the wire,
  * README.md:224, 248).
  */
final case class StreamRecord(
    streamName: String,
    shardId: String,
    partitionKey: String,
    sequenceNumber: String, // 30-digit decimal; zero-padded → lexical order == numeric order
    approxArrivalTs: Timestamp,
    data: Array[Byte]
)

/** CDC envelope decoded from a record payload (README.md:224):
  * `{"data": {...row image...}, "metadata": {"op": "I"|"U"|"D"}}`.
  */
object CdcEnvelope {
  /** Envelope schema for the `cdc.orders`-shaped table (README.md:224, 553-559). */
  def ordersSchema: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", LongType),
      StructField("status", StringType)))),
    StructField("metadata", StructType(Seq(
      StructField("op", StringType))))
  ))

  /** Open-payload variant: unknown per-table row image kept as a map
    * (SURVEY.md §1.4 — `MapType` for open-ended CDC row images).
    */
  def openSchema: StructType = StructType(Seq(
    StructField("data", MapType(StringType, StringType)),
    StructField("metadata", StructType(Seq(
      StructField("op", StringType))))
  ))
}

/** Portable manifest written after each committed batch (README.md:295-303).
  * Invariant: a data file is visible iff listed (README.md:429-430).
  */
final case class ManifestEntry(url: String, mandatory: Boolean)
final case class Manifest(entries: Seq[ManifestEntry])
