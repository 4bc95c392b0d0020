package graft.queries

import org.apache.spark.sql.functions._
import graft.codec.Envelope
import graft.model.CdcEnvelope
import graft.operators.Upsert
import graft.queries.Registry.tbl

/** CDC / stream-shaped capabilities exercised as batch queries over the
  * `events` table (ts = event time, user_id = partition key, props = open
  * JSON payload — FIXTURES.md §B). These are the batch-equivalent forms of
  * the reference's streaming semantics: envelope codec (T1-T4), time
  * partition derivation (T9), dedup-to-latest / upsert (K7/K8), hourly
  * analytics (README.md:38), exactly-once dedup invariant (README.md:178).
  */
object CdcQueries {

  private def dsum(c: org.apache.spark.sql.Column) = Agg.moneySum(c)
  private def dsumSql(e: String) = Agg.moneySumSql(e)

  val qs: Seq[Q] = Seq(

    // ---- hourly tumbling aggregation (the "hourly analytics" claim)
    Q("q20_hourly_analytics", (s, d) =>
      tbl(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("total_value"))
        .orderBy(col("hour_ts"), col("event_type")),
      Some(s"""SELECT date_trunc('hour', ts) AS hour_ts, event_type,
              | CAST(COUNT(*) AS BIGINT) AS n_events,
              | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
              | ${dsumSql("value")} AS total_value
              |FROM events GROUP BY hour_ts, event_type ORDER BY hour_ts, event_type""".stripMargin),
      bench = true),

    // ---- T9 partition derivation: year/month/day/hour columns + counts
    Q("q21_time_partitions", (s, d) => {
      val e = Envelope.withTimePartitions(tbl(s, d, "events"), col("ts"))
      e.groupBy(col("year"), col("month"), col("day"), col("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("year"), col("month"), col("day"), col("hour"))
    }, Some(
      """SELECT CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month,
        | CAST(day(ts) AS INT) AS day, CAST(hour(ts) AS INT) AS hour,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin)),

    // ---- open-payload JSON extraction (T2 ad-hoc form)
    Q("q22_json_payload", (s, d) =>
      tbl(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k")),
      Some("SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY k ORDER BY k")),

    // ---- open-payload envelope (§1.3 dynamic schemas): unknown per-table
    // row image decoded as map<string,string> instead of a fixed struct
    Q("q19_open_envelope", (s, d) =>
      tbl(s, d, "events")
        .select(explode(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType))).as(Seq("k", "v")))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), countDistinct(col("v")).as("n_values"),
          min(col("v").cast("long")).as("min_v"), max(col("v").cast("long")).as("max_v"))
        .orderBy(col("k")),
      Some(
        """SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
          | CAST(COUNT(DISTINCT v) AS BIGINT) AS n_values,
          | CAST(MIN(CAST(v AS BIGINT)) AS BIGINT) AS min_v,
          | CAST(MAX(CAST(v AS BIGINT)) AS BIGINT) AS max_v
          |FROM (SELECT unnest(json_keys(props)) AS k,
          |        json_extract_string(props, '$.' || unnest(json_keys(props))) AS v
          |      FROM events) t
          |GROUP BY k ORDER BY k""".stripMargin)),

    // ---- envelope codec roundtrip (T1-T4): struct→json→base64→decode→extract
    Q("q23_envelope_roundtrip", (s, d) => {
      val wire = Envelope.encode(struct(
        struct(col("user_id").as("id"), col("event_type").as("status")).as("data"),
        struct(lit("U").as("op")).as("metadata")))
      tbl(s, d, "events")
        .filter(col("event_id") < 500)
        .select(col("event_id"), wire.as("wire"))
        .select(col("event_id"),
          Envelope.decode(col("wire"), CdcEnvelope.ordersSchema).as("env"))
        .select(col("event_id"),
          col("env.data.id").as("id"), col("env.data.status").as("status"),
          col("env.metadata.op").as("op"))
        .orderBy(col("event_id"))
    }, Some(
      // DuckDB mirrors the roundtrip with its own JSON/base64 primitives;
      // only the decoded field values are compared (wire format is engine-local).
      """WITH wire AS (
        |  SELECT event_id,
        |    to_base64(encode(to_json(struct_pack(
        |      data := struct_pack(id := user_id, status := event_type),
        |      metadata := struct_pack(op := 'U'))))) AS w
        |  FROM events WHERE event_id < 500)
        |SELECT event_id,
        |  CAST(json_extract_string(decode(from_base64(w)), '$.data.id') AS BIGINT) AS id,
        |  json_extract_string(decode(from_base64(w)), '$.data.status') AS status,
        |  json_extract_string(decode(from_base64(w)), '$.metadata.op') AS op
        |FROM wire ORDER BY event_id""".stripMargin)),

    // ---- dedup-to-latest per key (K7 last-writer-wins, window ranking)
    Q("q24_latest_per_user", (s, d) =>
      Upsert.latestPerKey(tbl(s, d, "events"), col("user_id"), col("event_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value"),
          col("ts").as("last_ts"))
        .orderBy(col("user_id")),
      Some(
        """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
          | value AS last_value, ts AS last_ts
          |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |      FROM events) t
          |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- K8 CDC upsert: state from first half of the stream, changes from
    // the second half, 'error' events act as deletes. Must equal
    // latest-overall-per-key minus deleted keys.
    Q("q25_cdc_upsert", (s, d) => {
      val e = tbl(s, d, "events").withColumn("op",
        when(col("event_type") === "error", "D").otherwise("U"))
      val half = 5000L // sf-independent split; events ids are 0..n-1
      val targetState = Upsert
        .latestPerKey(e.filter(col("event_id") < half), col("user_id"), col("event_id"))
        .where(col("op") =!= "D").drop("op")
      val changes = e.filter(col("event_id") >= half)
      Upsert.applyChanges(targetState, changes, "user_id", "op", "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }, Some(
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin)),

    // ---- exactly-once invariant as a query: replayed (duplicated) stream
    // deduped by record id returns the original stream (README.md:178, 204)
    Q("q26_replay_dedup", (s, d) => {
      val e = tbl(s, d, "events")
      val replayed = e.unionAll(e.filter(col("event_id") % 3 === 0)) // partial replay
      replayed.dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("event_type"))
    }, Some(
      s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, ${dsumSql("value")} AS total_value
         |FROM (SELECT DISTINCT ON (event_id) * FROM
         |  (SELECT * FROM events UNION ALL SELECT * FROM events WHERE event_id % 3 = 0) u
         |  ORDER BY event_id) t
         |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- T11 key salting: hot key spread over N sub-keys; multiset of
    // records preserved (order traded for balance, README.md:84-86)
    Q("q27_salted_counts", (s, d) => {
      val salted = tbl(s, d, "events").withColumn("salted_key",
        concat(col("user_id").cast("string"), lit("||"),
          pmod(col("event_id"), lit(16)).cast("string")))
      salted.groupBy(col("salted_key")).agg(count(lit(1)).as("n"))
        .groupBy().agg(count(lit(1)).as("n_subkeys"), sum(col("n")).as("n_records"))
    }, Some(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_subkeys, CAST(SUM(n) AS BIGINT) AS n_records
        |FROM (SELECT CAST(user_id AS VARCHAR) || '||' || CAST(event_id % 16 AS VARCHAR) AS salted_key,
        |             COUNT(*) AS n
        |      FROM events GROUP BY 1) t""".stripMargin)),

    // ---- the full skew-management loop (T11 operationalized): plant a
    // hot key carrying ~25% of an inflated stream, DETECT it by record
    // share (map-side combined key counts — records never move), then
    // aggregate it through the two-phase salted path. The salted result
    // must equal the plain group-by exactly — salting changes the shuffle
    // shape, never the answer — and the detector's share must match SQL.
    Q("q101_hot_key_salting", (s, d) => {
      import graft.operators.Salting
      val events = tbl(s, d, "events")
      val skewed = events.unionByName(
        events.where(pmod(col("event_id"), lit(3)) === 0)
          .withColumn("user_id", lit(-1L)))
      val hot = Salting.detectHotKeys(skewed, col("user_id"), minShare = 0.05)
        .select(col("key"), round(col("share"), 4).as("share"))
      val cents = round(col("value") * 100).cast("long")
      val agg = Salting.saltedAgg(skewed, col("user_id"), col("event_id"), buckets = 16,
        partials = Map("n_part" -> count(lit(1)), "cents_part" -> sum(cents)),
        finals = Map("n" -> sum(col("n_part")), "total_cents" -> sum(col("cents_part"))))
      hot.join(agg, Seq("key"))
        .select(col("key"), col("share"), col("n"), col("total_cents"))
        .orderBy(col("key"))
    }, Some(
      """WITH skewed AS (
        |  SELECT user_id, event_id, value FROM events
        |  UNION ALL
        |  SELECT -1 AS user_id, event_id, value FROM events WHERE event_id % 3 = 0),
        |counts AS (SELECT user_id AS key, COUNT(*) AS n FROM skewed GROUP BY 1),
        |total AS (SELECT SUM(n) AS t FROM counts),
        |hot AS (SELECT key, ROUND(CAST(n AS DOUBLE) / t, 4) AS share
        |        FROM counts, total WHERE CAST(n AS DOUBLE) / t >= 0.05),
        |agg AS (SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n,
        |          CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |        FROM skewed GROUP BY 1)
        |SELECT hot.key, hot.share, agg.n, agg.total_cents
        |FROM hot JOIN agg USING (key) ORDER BY key""".stripMargin)),

    // ---- CSV bulk-import path (the batch-file sibling of the streaming
    // ingest — operational backfills arrive as CSV exports): events staged
    // as headered CSV with ISO timestamps, read back with an EXPLICIT
    // schema (inference on 100 TB of CSV is a second full scan), and
    // aggregated identically to the parquet path. Round-trip fidelity of
    // timestamps/doubles through text is what the oracle hash-checks.
    Q("q97_csv_ingest", (s, d) => {
      val base = Registry.tmpDir("graft-q97-")
      val e = tbl(s, d, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .where(dayofmonth(col("ts")) <= 12)
      e.write.mode("overwrite").option("header", true)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(s"$base/csv")
      s.read.schema(e.schema)
        .option("header", true)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(s"$base/csv")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
          Agg.moneySum(col("value")).as("total_value"),
          max(col("ts")).as("max_ts"))
        .orderBy(col("event_type"))
    }, Some(
      s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         | ${dsumSql("value")} AS total_value, MAX(ts) AS max_ts
         |FROM events WHERE day(ts) <= 12 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- VARIANT semi-structured payload (Spark 4's shredded JSON type —
    // the modern form of q22's string-path extraction): props parses ONCE
    // into a binary VARIANT, round-trips through parquet, and typed access
    // is `variant_get` — at scale this replaces per-query JSON re-parsing
    // with a parse-once, read-many encoding.
    Q("q98_variant_payload", (s, d) => {
      val base = Registry.tmpDir("graft-q98-")
      tbl(s, d, "events")
        .select(col("event_id"), parse_json(col("props")).as("payload"))
        .write.mode("overwrite").parquet(s"$base/variant")
      s.read.parquet(s"$base/variant")
        .select(variant_get(col("payload"), "$.k", "long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }, Some(
      "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY k ORDER BY k"))
  )
}
