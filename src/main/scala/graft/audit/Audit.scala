package graft.audit

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

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
    batchDurationMs: Long)

final class AuditListener extends StreamingQueryListener {
  private val log = new ConcurrentLinkedQueue[BatchAudit]()

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    log.add(BatchAudit(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId, p.timestamp, p.numInputRows,
      safe(p.inputRowsPerSecond), safe(p.processedRowsPerSecond),
      p.batchDuration))
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
