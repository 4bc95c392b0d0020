package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.{AsofJoin, Sessionize}
import org.apache.spark.sql.functions._

/** Custom streaming state (SURVEY.md §2.7 "stateful ops") + as-of join and
  * sessionization operator edge cases.
  */
class StatefulSpec extends SparkSuite {
  import spark.implicits._

  test("mapGroupsWithState keeps running per-key counts across micro-batches") {
    val input = MemoryStream[(Long, Double)](spark)
    val counts = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (key, n)
      }
    val q = counts.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("stateful_counts").start()
    input.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
    q.processAllAvailable()
    input.addData((1L, 3.0), (3L, 7.0))
    q.processAllAvailable()
    q.stop()
    // latest emitted state per key
    val last = spark.table("stateful_counts").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("as-of join: no version in effect yields null; <= semantics at exact ts") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 200.0))
      .toDF("user_id", "ts", "v")
    val left = Seq(
      (0L, 1L, ts("2024-01-01 09:59:59")), // before any version → null
      (1L, 1L, ts("2024-01-01 10:00:00")), // exactly at version ts → 100
      (2L, 1L, ts("2024-01-01 11:30:00")), // between → 100
      (3L, 1L, ts("2024-01-01 12:00:00")), // at second → 200
      (4L, 2L, ts("2024-01-01 15:00:00"))) // key with no versions → null
      .toDF("event_id", "user_id", "ts")
    val got = AsofJoin.backward(left, right, "user_id", "ts", "ts", Seq("v"))
      .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(0L -> None, 1L -> Some(100.0), 2L -> Some(100.0),
      3L -> Some(200.0), 4L -> None))
  }

  test("as-of join: matched row's genuine NULLs survive; no cross-row stitching") {
    // version at 12:00 has v=null, w=9 — an event after it must see exactly
    // (null, 9), NOT the older version's v=100 stitched with the newer w
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0), Option(7.0)),
      (1L, ts("2024-01-01 12:00:00"), None, Option(9.0)))
      .toDF("user_id", "ts", "v", "w")
    val left = Seq(
      (0L, 1L, ts("2024-01-01 11:00:00")), // matches v=100, w=7
      (1L, 1L, ts("2024-01-01 13:00:00"))) // matches v=null, w=9
      .toDF("event_id", "user_id", "ts")
    val got = AsofJoin.backward(left, right, "user_id", "ts", "ts", Seq("v", "w"))
      .select($"event_id", $"v", $"w").as[(Long, Option[Double], Option[Double])]
      .collect().map { case (k, v, w) => k -> (v, w) }.toMap
    assert(got == Map(
      0L -> (Some(100.0), Some(7.0)),
      1L -> (None, Some(9.0))))
  }

  test("sessionization splits exactly at the gap boundary") {
    val rows = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:29:59")), // within 30 min of previous
      (1L, 12L, ts("2024-01-01 11:00:00")), // exactly 30:01 after → new session
      (2L, 20L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_id", "ts").select($"user_id", $"ts", $"event_id")
    val got = Sessionize.sessions(rows, $"user_id", $"ts", $"event_id")
      .select($"key", $"session_id", $"n_events").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("flatMapGroupsWithState: stateful first-seen dedup emits each key once across batches") {
    val input = MemoryStream[(Long, String)](spark)
    val firstSeen = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          val seen = state.getOption.getOrElse(false)
          state.update(true)
          if (seen) Iterator.empty else rows.take(1).map { case (k, v) => (k, v) }
      }
    val q = firstSeen.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("first_seen").start()
    input.addData((1L, "a"), (2L, "b"), (1L, "a-dup-same-batch"))
    q.processAllAvailable()
    input.addData((1L, "a-dup-later-batch"), (3L, "c"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("first_seen").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("streaming session_window agg matches the batch Sessionize operator") {
    val input = MemoryStream[(Long, java.sql.Timestamp, Long)](spark)
    val sessions = input.toDF().toDF("user_id", "ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
    val q = sessions.writeStream.outputMode("complete")
      .format("memory").queryName("sess_stream").start()
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:20:00"), 2L), // same session (gap < 30m)
      (1L, ts("2024-01-01 11:30:00"), 3L), // new session
      (2L, ts("2024-01-01 10:00:00"), 4L))
    rows.foreach(r => input.addData(r))
    q.processAllAvailable()
    q.stop()
    val streaming = spark.table("sess_stream")
      .select($"user_id", $"n_events").as[(Long, Long)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val batch = Sessionize.sessions(rows.toDF("user_id", "ts", "event_id"),
      $"user_id", $"ts", $"event_id")
      .select($"key", $"n_events").as[(Long, Long)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.size }
    assert(streaming == batch)
  }

  test("dropDuplicatesWithinWatermark suppresses replays across batches") {
    val input = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val deduped = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ddww").start()
    input.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    // replayed id=1 within the watermark window must not re-emit
    input.addData((1L, ts("2024-01-01 10:02:00")), (3L, ts("2024-01-01 10:03:00")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("ddww").select($"id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
}
