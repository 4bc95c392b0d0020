package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `spark.readStream.format("graftlog")` — a native DataSourceV2
  * MicroBatchStream over the [[GraftLog]] segment store: the real Spark
  * shape of the reference's stream consumer (README.md:43-53, S1–S5),
  * replacing the file-stream emulation's split admission surface.
  *
  *  - **Offsets are per-shard SequenceNumbers** (`{"shard":"lastSeq"}`),
  *    exactly the reference's checkpoint shape — not file names. A batch
  *    is the segment set `(startSeq, endSeq]` per shard.
  *  - **Per-shard ordering**: one input partition per shard per batch;
  *    the reader emits that shard's records in sequence order (segments
  *    are range-disjoint and internally sorted by the [[GraftLog.append]]
  *    contract, re-validated at plan time).
  *  - **Admission control** (`SupportsAdmissionControl`): byte and/or
  *    record budgets per trigger (`maxBytesPerTrigger`,
  *    `maxRecordsPerTrigger`) — the "64 MB OR 60 s" buffer semantics'
  *    SIZE half, decided from segment-name metadata alone (a driver-side
  *    listing, no data read). At least one segment is admitted whenever
  *    data is available, so progress never stalls on a large segment.
  *  - **Replay / starting position** (S5): `startingPosition` =
  *    `TRIM_HORIZON` (default), `LATEST`, or an explicit per-shard offset
  *    JSON (`AT_SEQUENCE` — resume after those sequence numbers).
  *  - **Reshard**: a shard directory appearing mid-stream (scale-out) is
  *    picked up from its beginning at the next trigger; per-key ordering
  *    survives because a key's records land in exactly one shard per
  *    epoch and sequence numbers only grow.
  *  - **Trigger.AvailableNow** (`SupportsTriggerAvailableNow`): the end
  *    offset is snapshotted at start; budgeted batches run up to exactly
  *    that snapshot.
  *
  * `spark.read.format("graftlog")` (batch) reads the whole log — the
  * replay-audit/backfill path.
  */
class GraftLogTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.sources.ShardedLog.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graftlog needs a path: spark.readStream.format(\"graftlog\").load(<logDir>)"))
    new GraftLogTable(path)
  }
}

private[v2] class GraftLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graftlog:$path"
  override def schema(): StructType = graft.sources.ShardedLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLogScan(path, options)
}

private[v2] class GraftLogScan(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = graft.sources.ShardedLog.schema
  override def description(): String = s"graftlog:$path"

  private def hconf() = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLogMicroBatchStream(path, options, hconf())

  /** Batch read: every segment currently in the log, one partition per
    * shard — replay audits and backfills over the same store.
    */
  override def toBatch: Batch = new Batch {
    private val conf = hconf()
    override def planInputPartitions(): Array[InputPartition] = {
      val fs = new HPath(path).getFileSystem(conf.value)
      GraftLog.listSegments(fs, path).toSeq.sortBy(_._1).collect {
        case (shard, segs) if segs.nonEmpty =>
          GraftLogInputPartition(shard, segs.map(_.path).toArray)
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftLogReaderFactory(conf)
  }
}

/** Streaming offset: shard → last admitted SequenceNumber (absent shard =
  * nothing admitted yet). Sequence numbers compare LEXICOGRAPHICALLY —
  * producers use fixed-width encodings (the reference's zero-padded
  * SequenceNumbers; [[graft.sources.ShardedLog.fromEvents]] pads to 30).
  */
private[v2] final case class GraftLogOffset(shardSeqs: Map[String, String])
    extends Offset {
  override def json(): String =
    shardSeqs.toSeq.sorted
      .map { case (s, q) => s""""$s":"$q"""" }.mkString("{", ",", "}")
}

private[v2] object GraftLogOffset {
  private val Entry = """"([^"]+)"\s*:\s*"([^"]*)"""".r
  def fromJson(json: String): GraftLogOffset =
    GraftLogOffset(Entry.findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toMap)
}

private[v2] class GraftLogMicroBatchStream(path: String,
    options: CaseInsensitiveStringMap, conf: SerializableConfiguration)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def fs = new HPath(path).getFileSystem(conf.value)

  private val maxRecords = Option(options.get("maxRecordsPerTrigger")).map(_.toLong)
  private val maxBytes = Option(options.get("maxBytesPerTrigger")).map(_.toLong)
  private val startingPosition =
    Option(options.get("startingPosition")).getOrElse("TRIM_HORIZON")

  // Trigger.AvailableNow snapshot: batches never admit past it
  @volatile private var availableNowCap: Option[Map[String, String]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(GraftLog.highWater(fs, path))

  override def initialOffset(): Offset = startingPosition.trim match {
    case s if s.startsWith("{") => GraftLogOffset.fromJson(s) // AT_SEQUENCE
    case "TRIM_HORIZON" => GraftLogOffset(Map.empty)
    case "LATEST" => GraftLogOffset(GraftLog.highWater(fs, path))
    case other => throw new IllegalArgumentException(
      s"graftlog startingPosition '$other': use TRIM_HORIZON, LATEST, or a " +
        """per-shard offset JSON ({"shardId-...":"<seq>"}) to resume AFTER """ +
        "those sequence numbers")
  }

  override def getDefaultReadLimit: ReadLimit = (maxRecords, maxBytes) match {
    case (Some(r), Some(b)) =>
      ReadLimit.compositeLimit(Array(ReadLimit.maxRows(r), ReadLimit.maxBytes(b)))
    case (Some(r), None) => ReadLimit.maxRows(r)
    case (None, Some(b)) => ReadLimit.maxBytes(b)
    case _ => ReadLimit.allAvailable()
  }

  /** A shard's candidate segments past offset `o`, with the corrupt-log
    * check: a segment STRADDLING the committed offset means the producer
    * violated per-shard monotonicity — refuse loudly (skipping would drop
    * records; rereading would double-deliver).
    */
  private def candidates(segs: Seq[GraftLog.Segment], o: String): Seq[GraftLog.Segment] =
    segs.flatMap { s =>
      if (s.lastSeq <= o) None // fully delivered
      else if (s.firstSeq > o) Some(s)
      else throw new IllegalStateException(
        s"graftlog segment ${s.path} straddles committed offset $o " +
          s"(range ${s.firstSeq}..${s.lastSeq}): the log's per-shard " +
          "monotonicity contract was violated by a producer — the log is " +
          "corrupt at this shard and cannot be read exactly-once")
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[GraftLogOffset].shardSeqs
    val segsByShard = GraftLog.listSegments(fs, path)
    // flatten admission candidates; AvailableNow caps to the snapshot
    val cand = segsByShard.toSeq.flatMap { case (shard, segs) =>
      val capped = availableNowCap match {
        case Some(cap) => segs.filter(s => cap.get(shard).exists(s.lastSeq <= _))
        case None => segs
      }
      candidates(capped, startMap.getOrElse(shard, ""))
    }
    // budget from the ReadLimit (the options' defaults ride in via
    // getDefaultReadLimit; AvailableNow passes them back here)
    var rowBudget = Long.MaxValue
    var byteBudget = Long.MaxValue
    def apply(l: ReadLimit): Unit = l match {
      case r: ReadMaxRows => rowBudget = math.min(rowBudget, r.maxRows())
      case b: ReadMaxBytes => byteBudget = math.min(byteBudget, b.maxBytes())
      case _: ReadAllAvailable => ()
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.foreach(apply)
      case _ => () // unknown limit kinds admit everything (Spark-internal)
    }
    apply(limit)
    // admit whole segments in global firstSeq order (within a shard this
    // IS sequence order) until a budget trips; always ≥ 1 segment so a
    // single over-budget segment cannot stall the stream. Once a shard's
    // segment is REJECTED the shard is blocked for this trigger: admitting
    // a later segment of the same shard would advance its offset PAST the
    // rejected one and silently drop its records
    val admitted = Map.newBuilder[String, String]
    val blocked = scala.collection.mutable.Set[String]()
    var rows = 0L
    var bytes = 0L
    cand.sortBy(s => (s.firstSeq, s.shard)).foreach { s =>
      if (!blocked(s.shard)) {
        if (rows == 0L || (rows + s.count <= rowBudget && bytes + s.bytes <= byteBudget)) {
          rows += s.count
          bytes += s.bytes
          admitted += s.shard -> s.lastSeq // per-shard order ⇒ later overwrites
        } else { blocked += s.shard; () }
      }
    }
    GraftLogOffset(startMap ++ admitted.result())
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): Offset =
    GraftLogOffset(GraftLog.highWater(fs, path))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startMap = start.asInstanceOf[GraftLogOffset].shardSeqs
    val endMap = end.asInstanceOf[GraftLogOffset].shardSeqs
    val segsByShard = GraftLog.listSegments(fs, path)
    endMap.toSeq.sorted.flatMap { case (shard, endSeq) =>
      val o = startMap.getOrElse(shard, "")
      if (endSeq <= o) None
      else {
        // candidates() re-validates monotonicity; the lastSeq ≤ end cut
        // keeps a replayed batch byte-identical even if the log has grown
        // since the offset was committed
        val segs = candidates(segsByShard.getOrElse(shard, Seq.empty), o)
          .filter(_.lastSeq <= endSeq)
        if (segs.isEmpty) None
        else Some(GraftLogInputPartition(shard, segs.map(_.path).toArray))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(conf)

  override def deserializeOffset(json: String): Offset = GraftLogOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One shard's slice of a batch: its admitted segment files, in sequence
  * order. The partition is the shard — per-shard ordering is a
  * single-reader property, exactly the reference's shard→consumer mapping.
  */
private[v2] final case class GraftLogInputPartition(shard: String,
    segmentPaths: Array[String]) extends InputPartition

private[v2] class GraftLogReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftLogInputPartition]
    new GraftLogPartitionReader(p.shard, p.segmentPaths, conf)
  }
}

/** Streams one shard's segment files line by line — no per-segment
  * buffering, so memory is O(line), not O(segment).
  */
private[v2] class GraftLogPartitionReader(shard: String, paths: Array[String],
    conf: SerializableConfiguration) extends PartitionReader[InternalRow] {
  private val shardUtf8 = UTF8String.fromString(shard)
  private var fileIdx = 0
  private var reader: java.io.BufferedReader = null
  private var current: InternalRow = null

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (fileIdx >= paths.length) return false
    val p = new HPath(paths(fileIdx))
    fileIdx += 1
    val in = p.getFileSystem(conf.value).open(p)
    reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !openNext()) return false
      val line = reader.readLine()
      if (line == null) { reader.close(); reader = null }
      else if (line.nonEmpty) {
        val f = line.split('\t')
        if (f.length != 5) throw new java.io.IOException(
          s"graftlog segment ${paths(fileIdx - 1)}: malformed line " +
            s"(${f.length} fields, expected 5)")
        current = new GenericInternalRow(Array[Any](
          UTF8String.fromString(f(0)), shardUtf8, UTF8String.fromString(f(1)),
          UTF8String.fromString(f(2)), java.lang.Long.parseLong(f(3)),
          UTF8String.fromString(f(4))))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) reader.close()
}
