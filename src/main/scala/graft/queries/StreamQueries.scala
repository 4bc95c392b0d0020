package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.catalog.LakeCatalog
import graft.sources.ShardedLog
import graft.streaming.{Alert, Deliver}
import graft.queries.Registry.tbl

/** End-to-end Structured Streaming paths run through the correctness
  * harness: producer → sharded log → streaming decode/enrich/deliver →
  * partitioned lake → catalog → SQL (entry point B+C of SURVEY.md §3), and
  * the fast alert path (entry point A). Deterministic (fixed clock,
  * event-time partitions), so the lake contents are oracle-checkable
  * against plain SQL over `events`.
  */
object StreamQueries {

  /** Payload schema matching ShardedLog.fromEvents envelopes. */
  private val payloadSchema = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", LongType),
      StructField("status", StringType),
      StructField("value", DoubleType),
      StructField("ts", TimestampType),
      StructField("event_id", LongType)))),
    StructField("metadata", StructType(Seq(StructField("op", StringType))))))

  private val fixedClock = java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13")

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  val qs: Seq[Q] = Seq(

    // ---- full lake path: PutRecords → stream → deliver → catalog → SQL
    Q("q50_stream_deliver", (s, d) => {
      val logDir = tmp("graft-log-")
      val lakeDir = tmp("graft-lake-")
      val ckDir = tmp("graft-ck-")
      ShardedLog.put(ShardedLog.fromEvents(tbl(s, d, "events")), logDir)
      val q = Deliver.start(
        ShardedLog.readStream(s, logDir),
        payloadSchema,
        Deliver.Config(lakeDir = lakeDir, checkpointDir = ckDir,
          trigger = Trigger.AvailableNow(), clock = Some(fixedClock)))
      q.awaitTermination()
      LakeCatalog.registerLake(s, "cdc_events", lakeDir)
      s.sql(
        """SELECT day, hour, op, COUNT(*) AS n, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_keys,
          |       MIN(processed_at) AS processed_at
          |FROM cdc_events GROUP BY day, hour, op ORDER BY day, hour, op""".stripMargin)
    }, Some(
      """SELECT CAST(day(ts) AS INT) AS day, CAST(hour(ts) AS INT) AS hour,
        | CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
        | TIMESTAMP '2025-11-07 14:32:09.13' AS processed_at
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ---- fast alert path: EFO-style predicate → notification batches
    Q("q51_stream_alerts", (s, d) => {
      val logDir = tmp("graft-alog-")
      val ckDir = tmp("graft-ack-")
      ShardedLog.put(ShardedLog.fromEvents(tbl(s, d, "events")), logDir)
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
      val q = Alert.start(
        ShardedLog.readStream(s, logDir), payloadSchema,
        pred = col("env.data.status") === "error" && col("env.data.value") > 100.0,
        checkpointDir = ckDir,
        notify = batch => batch.collect().foreach(sink.add),
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      val rows = sink.iterator().asScala.toSeq.map(r =>
        (r.getAs[Long]("event_id"), r.getAs[Long]("id"),
          r.getAs[Double]("value"), r.getAs[String]("op")))
      import s.implicits._
      rows.toDF("event_id", "user_id", "value", "op").orderBy(col("event_id"))
    }, Some(
      """SELECT event_id, user_id, value, 'D' AS op FROM events
        |WHERE event_type = 'error' AND value > 100.0 ORDER BY event_id""".stripMargin)),

    // ---- the reference's golden row (README.md:553-559): single CDC record
    // through the full pipeline, point query on the partitioned lake
    Q("q52_golden_row", (s, _) => {
      import s.implicits._
      val logDir = tmp("graft-glog-")
      val lakeDir = tmp("graft-glake-")
      val ckDir = tmp("graft-gck-")
      val golden = Seq((98765L, java.sql.Timestamp.valueOf("2025-11-07 14:32:09.13")))
        .toDF("user_id", "ts")
        .select(col("user_id"), lit("shipped").as("event_type"),
          lit(0.0).as("value"), col("ts"), lit(0L).as("event_id"))
      ShardedLog.put(ShardedLog.fromEvents(golden), logDir)
      val q = Deliver.start(ShardedLog.readStream(s, logDir), payloadSchema,
        Deliver.Config(lakeDir = lakeDir, checkpointDir = ckDir,
          trigger = Trigger.AvailableNow(), clock = Some(fixedClock)))
      q.awaitTermination()
      LakeCatalog.registerLake(s, "cdc_orders", lakeDir)
      s.sql("SELECT id, status, processed_at FROM cdc_orders WHERE hour = 14 LIMIT 1")
    }, Some("SELECT CAST(98765 AS BIGINT) AS id, 'shipped' AS status, " +
      "TIMESTAMP '2025-11-07 14:32:09.13' AS processed_at")),

    // ---- stream-stream interval join with watermarks on both sides:
    // purchases matched to signups of the same user within the prior 2 h
    // (state-bounded by the time constraint; oracle = batch range join)
    Q("q54_stream_stream_join", (s, d) => {
      val src = tmp("graft-ssj-") + "/events"
      val e = tbl(s, d, "events").select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"))
      e.write.mode("overwrite").parquet(src)
      val name = "graft_q54_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val purchases = s.readStream.schema(e.schema).parquet(src)
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val signups = s.readStream.schema(e.schema).parquet(src)
        .where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
          col("ts").as("s_ts"))
        .withWatermark("s_ts", "1 hour")
      val q = purchases.join(signups,
        expr("p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + interval 2 hours"))
        .select(col("purchase_id"), col("signup_id"), col("p_user").as("user_id"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      q.processAllAvailable()
      q.stop()
      s.table(name).orderBy(col("purchase_id"), col("signup_id"))
    }, Some(
      """SELECT p.event_id AS purchase_id, s.event_id AS signup_id, p.user_id
        |FROM events p JOIN events s
        |  ON p.user_id = s.user_id AND p.event_type = 'purchase'
        | AND s.event_type = 'signup'
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 2 HOUR
        |ORDER BY purchase_id, signup_id""".stripMargin),
      bench = true)
  )
}
