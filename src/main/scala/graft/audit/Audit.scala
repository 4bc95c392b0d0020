package graft.audit

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Batch data-quality audits over delivered data — the forensic queries the
  * reference's runbook runs against its own guarantees.
  */
object Audit {

  /** Per-key ordering audit (README.md:53: "records with the same
    * PartitionKey never reorder"): replaying each key's records in
    * sequence order, flag every adjacent pair whose event time REGRESSES —
    * the signature of an out-of-order producer, a resharding bug, or
    * clock skew upstream. Returns the violating pairs
    * (key, seq, prev_ts, ts, regress_seconds).
    *
    * One key-shuffle (the lag window) over (key, seq, ts) only — payloads
    * never move. At lake scale, run it per partition slice; the audit is
    * embarrassingly parallel across keys.
    */
  def orderingViolations(records: DataFrame, keyCol: String, seqCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    records.select(col(keyCol), col(seqCol), col(tsCol))
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .where(col("prev_ts") > col(tsCol))
      .select(col(keyCol), col(seqCol), col("prev_ts"), col(tsCol),
        (unix_timestamp(col("prev_ts")) - unix_timestamp(col(tsCol)))
          .as("regress_seconds"))
  }
}

/** Observability (SURVEY.md §2.8): the reference's per-stage forensic audit
  * trail (README.md:200-330) re-expressed as a structured per-batch log from
  * `StreamingQueryProgress` — input rows, processing rate, batch duration
  * (the `MillisBehindLatest`/`IteratorAge` analogues O1-O2).
  */
final case class BatchAudit(
    queryName: String,
    batchId: Long,
    timestamp: String,
    numInputRows: Long,
    inputRowsPerSecond: Double,
    processedRowsPerSecond: Double,
    batchDurationMs: Long,
    // state-store observability (the O1 contract extended to stateful
    // queries — stream-stream joins, windowed aggs, mapGroupsWithState):
    // zero for stateless queries. Unbounded state growth here is the
    // watermark-misconfiguration signature — rows climb monotonically and
    // memory follows until executors OOM.
    stateOperators: Int = 0,
    stateRowsTotal: Long = 0L,
    stateMemoryBytes: Long = 0L,
    stateRowsUpdated: Long = 0L,
    stateRowsRemoved: Long = 0L)

final class AuditListener extends StreamingQueryListener {
  private val log = new ConcurrentLinkedQueue[BatchAudit]()

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val so = Option(p.stateOperators).map(_.toSeq).getOrElse(Seq.empty)
    log.add(BatchAudit(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId, p.timestamp, p.numInputRows,
      safe(p.inputRowsPerSecond), safe(p.processedRowsPerSecond),
      p.batchDuration,
      stateOperators = so.size,
      stateRowsTotal = so.map(_.numRowsTotal).sum,
      stateMemoryBytes = so.map(_.memoryUsedBytes).sum,
      stateRowsUpdated = so.map(_.numRowsUpdated).sum,
      stateRowsRemoved = so.map(_.numRowsRemoved).sum))
  }

  private def safe(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d

  def entries: Seq[BatchAudit] = {
    import scala.jdk.CollectionConverters._
    log.iterator().asScala.toVector
  }

  /** O4: the audit trail as data — queryable/persistable like any table
    * (the reference's forensic runbook, README.md:200-330, as a DataFrame).
    */
  def toDF(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    entries.toDF()
  }
}
