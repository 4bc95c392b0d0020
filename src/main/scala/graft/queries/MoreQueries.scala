package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Sessionize}
import graft.queries.Registry.tbl

/** Second-wave capabilities: exact percentiles, as-of join, sessionization,
  * ORC output format, approximate distinct-count (accuracy asserted in the
  * oracle), streaming windowed aggregation with watermark.
  */
object MoreQueries {

  private def dsum(c: org.apache.spark.sql.Column) = Agg.moneySum(c)
  private def dsumSql(e: String) = Agg.moneySumSql(e)

  val qs: Seq[Q] = Seq(

    // ---- exact percentiles (sort-based agg; linear interpolation parity)
    Q("q13_percentiles", (s, d) =>
      tbl(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("qty_p25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("qty_p50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("qty_p75"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("price_p90"))
        .orderBy(col("l_returnflag")),
      Some(
        """SELECT l_returnflag,
          | ROUND(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
          | ROUND(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
          | ROUND(quantile_cont(l_quantity, 0.75), 4) AS qty_p75,
          | ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- backward as-of join: attach the signup value in effect at each
    // purchase (time-versioned dimension enrichment)
    Q("q14_asof_join", (s, d) => {
      val e = tbl(s, d, "events")
      val wTies = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val signups = e.filter(col("event_type") === "signup")
        .withColumn("__rn", row_number().over(wTies)).where(col("__rn") === 1)
        .select(col("user_id"), col("ts"), col("value").as("signup_value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsofJoin.backward(purchases, signups, "user_id", "ts", "ts", Seq("signup_value"))
        .select(col("event_id"), col("user_id"), col("signup_value"))
        .orderBy(col("event_id"))
    }, Some(
      """WITH r AS (SELECT user_id, ts, value AS signup_value FROM
        |   (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'signup') t WHERE rn = 1),
        |l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, r.signup_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin)),

    // ---- gaps-and-islands sessionization (30-minute inactivity gap)
    Q("q28_sessionization", (s, d) =>
      Sessionize.sessions(tbl(s, d, "events"),
        col("user_id"), col("ts"), col("event_id"), "INTERVAL 30 MINUTE")
        .orderBy(col("key"), col("session_id")),
      Some(
        """WITH o AS (SELECT user_id, ts, event_id,
          |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          |  FROM events),
          |g AS (SELECT user_id, ts, event_id,
          |    CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
          |  FROM o),
          |sess AS (SELECT user_id, ts,
          |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS session_id
          |  FROM g)
          |SELECT user_id AS key, session_id, MIN(ts) AS session_start,
          |  MAX(ts) AS session_end, CAST(COUNT(*) AS BIGINT) AS n_events
          |FROM sess GROUP BY key, session_id ORDER BY key, session_id""".stripMargin)),

    // ---- ORC output format (F3): write-read roundtrip preserves content
    Q("q15_orc_roundtrip", (s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-orc-").toString + "/events"
      tbl(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("event_type"))
    }, Some(
      s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, ${dsumSql("value")} AS total_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- approximate distinct count (HLL): accuracy contract in the oracle
    Q("q16_approx_distinct", (s, d) =>
      tbl(s, d, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.1).as("within_10pct"))
        .orderBy(col("event_type")),
      Some(
        """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
          | TRUE AS within_10pct
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- statistical aggregates (corr/stddev/var/covar): round(4) absorbs
    // the engines' different accumulation algorithms (Welford vs naive)
    Q("q18_stats_aggregates", (s, d) =>
      tbl(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(stddev_samp(col("l_quantity")), 4).as("stddev_qty"),
          round(var_samp(col("l_discount")), 4).as("var_disc"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("covar_qty_disc"))
        .orderBy(col("l_returnflag")),
      Some(
        """SELECT l_returnflag,
          | ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
          | ROUND(stddev_samp(l_quantity), 4) AS stddev_qty,
          | ROUND(var_samp(l_discount), 4) AS var_disc,
          | ROUND(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- pivot: order counts and totals per priority, spread by status
    Q("q29_pivot_status", (s, d) =>
      tbl(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderpriority"), col("F").as("n_f"), col("O").as("n_o"),
          col("P").as("n_p"))
        .orderBy(col("o_orderpriority")),
      Some(
        """SELECT o_orderpriority,
          | CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
          | CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
          | CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
          |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- sliding (hopping) windows: every event lands in 4 overlapping
    // hour windows on a 15-minute grid — the overlap-factor shuffle cost is
    // the slide ratio, not the row count. Same `window()` API streams with
    // a watermark unchanged (q53's shape).
    Q("q59_sliding_window", (s, d) =>
      tbl(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("win_start"), col("event_type")),
      Some(
        s"""SELECT make_timestamp((epoch_us(ts) // 900000000 - g.k) * 900000000) AS win_start,
           | event_type, CAST(COUNT(*) AS BIGINT) AS n, ${dsumSql("value")} AS total_value
           |FROM events, UNNEST(generate_series(0, 3)) AS g(k)
           |GROUP BY win_start, event_type ORDER BY win_start, event_type""".stripMargin)),

    // ---- CUBE lattice over a join (full grouping-set coverage with rollup)
    Q("q17_cube_type_priority", (s, d) =>
      tbl(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some(
        s"""SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           | ${dsumSql("o_totalprice")} AS total
           |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
           |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // ---- streaming windowed aggregation with watermark (the event-time
    // analytics layer): stateful streaming agg must equal the batch answer
    Q("q53_stream_windowed_agg", (s, d) => {
      val e = tbl(s, d, "events").select(col("event_id"), col("ts"), col("event_type"), col("value"))
      val src = Registry.stageTable(s, d, "events",
        Seq("event_id", "ts", "event_type", "value"))
      val name = "graft_q53_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.schema(e.schema).parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .writeStream.outputMode("complete").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      s.table(name)
        .select(col("window.start").as("hour_ts"), col("event_type"),
          col("n_events"), col("total_value"))
        .orderBy(col("hour_ts"), col("event_type"))
    }, Some(
      s"""SELECT date_trunc('hour', ts) AS hour_ts, event_type,
         | CAST(COUNT(*) AS BIGINT) AS n_events, ${dsumSql("value")} AS total_value
         |FROM events GROUP BY hour_ts, event_type ORDER BY hour_ts, event_type""".stripMargin)),

    // ---- Z-order clustered rewrite + zone-map scan (r11): cluster
    // lineitem on (l_partkey, l_suppkey), then answer a 2-D range predicate
    // reading ONLY the files whose footer min/max can match — the oracle
    // pins both the answer AND that pruning actually fired (`pruned`),
    // so a layout regression that stops skipping files fails correctness,
    // not just the bench. Bounds are max/8 per dimension, data-derived so
    // the query scales with the SF instead of degenerating to select-all.
    Q("q118_zorder_scan", (s, d) => {
      val li = tbl(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      val dir = Registry.tmpDir("graft-q118z-")
      graft.operators.ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), dir, nFiles = 16)
      val Array(maxPart, maxSupp) = li.agg(max("l_partkey"), max("l_suppkey"))
        .head.toSeq.map(_.asInstanceOf[Long] / 8).toArray
      val pred = col("l_partkey") <= maxPart && col("l_suppkey") <= maxSupp
      val (kept, total) = graft.sources.ZoneMaps.pruneStats(s, dir, pred)
      graft.sources.ZoneMaps.scanWhere(s, dir, pred)
        .agg(count(lit(1)).as("n"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .withColumn("pruned", lit(kept > 0 && kept < total))
    }, Some(
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
         | ${dsumSql("l_quantity")} AS sum_qty,
         | ${dsumSql("l_extendedprice")} AS sum_price,
         | TRUE AS pruned
         |FROM lineitem
         |WHERE l_partkey <= (SELECT CAST(FLOOR(MAX(l_partkey) / 8.0) AS BIGINT) FROM lineitem)
         |  AND l_suppkey <= (SELECT CAST(FLOOR(MAX(l_suppkey) / 8.0) AS BIGINT) FROM lineitem)""".stripMargin))
  )
}
