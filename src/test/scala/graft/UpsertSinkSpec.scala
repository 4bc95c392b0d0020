package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.UpsertSink

/** Streaming CDC upsert sink: state evolves correctly across micro-batches;
  * snapshot swap is atomic (pointer names a complete snapshot at all times).
  */
class UpsertSinkSpec extends SparkSuite {
  import spark.implicits._

  test("keyed table state evolves correctly across change batches") {
    val base = tmpDir("graft-usink-")
    val input = MemoryStream[(Long, String, String, Long)](spark)
    val q = UpsertSink.start(
      input.toDF().toDF("id", "payload", "op", "seq"),
      s"$base/table", s"$base/ck", "id", "op", Seq("seq"),
      trigger = Trigger.ProcessingTime(0))

    def drain(): Unit = { q.processAllAvailable() }

    input.addData((1L, "a1", "I", 1L), (2L, "b1", "I", 2L))
    drain()
    assert(tableState(s"$base/table") == Map(1L -> "a1", 2L -> "b1"))

    // batch 2: update 1, delete 2, insert 3 — with an out-of-order duplicate
    input.addData((1L, "a2", "U", 4L), (1L, "aSTALE", "U", 3L),
      (2L, "x", "D", 5L), (3L, "c1", "I", 6L))
    drain()
    assert(tableState(s"$base/table") == Map(1L -> "a2", 3L -> "c1"))

    // pointer always names an existing complete snapshot
    val snap = UpsertSink.currentSnapshot(s"$base/table").get
    assert(new java.io.File(s"$base/table/$snap").isDirectory)
    q.stop()
  }

  test("restart with same checkpoint does not re-apply processed batches") {
    val base = tmpDir("graft-usink2-")
    val input = MemoryStream[(Long, String, String, Long)](spark)
    val q1 = UpsertSink.start(input.toDF().toDF("id", "payload", "op", "seq"),
      s"$base/table", s"$base/ck", "id", "op", Seq("seq"), Trigger.ProcessingTime(0))
    input.addData((1L, "v1", "I", 1L))
    q1.processAllAvailable(); q1.stop()
    val before = tableState(s"$base/table")
    // restart on the same (fully consumed) input and checkpoint
    val q2 = UpsertSink.start(input.toDF().toDF("id", "payload", "op", "seq"),
      s"$base/table", s"$base/ck", "id", "op", Seq("seq"), Trigger.ProcessingTime(0))
    q2.processAllAvailable(); q2.stop()
    assert(tableState(s"$base/table") == before)
  }

  private def tableState(dir: String): Map[Long, String] =
    UpsertSink.readTable(spark, dir).map(
      _.select($"id", $"payload").as[(Long, String)].collect().toMap)
      .getOrElse(Map.empty)
}
