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

    // the live commit always names a complete snapshot: every bucket
    // version it references exists on disk
    val commit = UpsertSink.currentCommit(s"$base/table").get
    assert(commit.versions.nonEmpty)
    commit.versions.foreach { case (b, v) =>
      assert(new java.io.File(s"$base/table/buckets/b=$b/$v").isDirectory,
        s"commit references missing bucket version b=$b/$v")
    }
    // and the schema is committed alongside (empty-table reads need it)
    assert(commit.schemaJson.contains("payload"))
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

  test("crash between bucket promote and commit leaves table readable and recoverable") {
    val base = tmpDir("graft-usink3-")
    val table = s"$base/table"
    def batchDf(rows: (Long, String, String, Long)*) =
      rows.toDF("id", "payload", "op", "seq")

    UpsertSink.applyBatch(batchDf((1L, "a1", "I", 1L), (2L, "b1", "I", 2L)),
      0L, table, "id", "op", Seq("seq"))
    assert(tableState(table) == Map(1L -> "a1", 2L -> "b1"))

    // batch 1 dies AFTER promoting its new bucket versions, BEFORE commit
    intercept[RuntimeException] {
      UpsertSink.applyBatch(batchDf((1L, "a2", "U", 3L), (3L, "c1", "I", 4L)),
        1L, table, "id", "op", Seq("seq"), crashBeforeCommit = true)
    }
    // readers still resolve the previous commit — never "no table", never a
    // partial state
    assert(tableState(table) == Map(1L -> "a1", 2L -> "b1"))
    assert(UpsertSink.currentCommit(table).get.batchId == 0L)

    // the replayed batch (same id, as the checkpoint would re-deliver it)
    // recovers: orphan versions of the crashed attempt are overwritten
    UpsertSink.applyBatch(batchDf((1L, "a2", "U", 3L), (3L, "c1", "I", 4L)),
      1L, table, "id", "op", Seq("seq"))
    assert(tableState(table) == Map(1L -> "a2", 2L -> "b1", 3L -> "c1"))
    assert(UpsertSink.currentCommit(table).get.batchId == 1L)
  }

  test("a legacy pointer-format table migrates to the commit log on first write") {
    val base = tmpDir("graft-usink5-")
    val table = s"$base/table"
    // build a healthy table, then rewrite its metadata in the OLD format:
    // single 'current' pointer + sibling _schema.json, no commits/
    UpsertSink.applyBatch(
      Seq((1L, "a1", "I", 1L), (2L, "b1", "I", 2L)).toDF("id", "payload", "op", "seq"),
      0L, table, "id", "op", Seq("seq"))
    val commit = UpsertSink.currentCommit(table).get
    val versions = commit.versions.toSeq.sortBy(_._1)
      .map { case (b, v) => s""""$b": "$v"""" }.mkString("{", ", ", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$table/current"),
      s"""{"batch": 0, "nbuckets": ${commit.nBuckets}, "versions": $versions}"""
        .getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$table/_schema.json"),
      commit.schemaJson.getBytes("UTF-8"))
    val deleted = new scala.reflect.io.Directory(
      new java.io.File(s"$table/commits")).deleteRecursively()
    assert(deleted)

    // the next batch must migrate (NOT brick the table with the
    // lost-commit-log error) and apply on top of the legacy state
    UpsertSink.applyBatch(
      Seq((2L, "b2", "U", 3L), (3L, "c1", "I", 4L)).toDF("id", "payload", "op", "seq"),
      1L, table, "id", "op", Seq("seq"))
    assert(tableState(table) == Map(1L -> "a1", 2L -> "b2", 3L -> "c1"))
    assert(UpsertSink.currentCommit(table).get.batchId == 1L)
    assert(!new java.io.File(s"$table/current").exists, "legacy pointer retired")
    assert(!new java.io.File(s"$table/_schema.json").exists, "legacy schema file retired")
  }

  test("time travel reads any retained commit; pruning respects the retention horizon") {
    val base = tmpDir("graft-usink6-")
    val table = s"$base/table"
    def batchDf(rows: (Long, String, String, Long)*) =
      rows.toDF("id", "payload", "op", "seq")
    UpsertSink.applyBatch(batchDf((1L, "a1", "I", 1L), (2L, "b1", "I", 2L)),
      0L, table, "id", "op", Seq("seq"), retainCommits = 3)
    UpsertSink.applyBatch(batchDf((1L, "a2", "U", 3L), (3L, "c1", "I", 4L)),
      1L, table, "id", "op", Seq("seq"), retainCommits = 3)
    UpsertSink.applyBatch(batchDf((2L, "x", "D", 5L)),
      2L, table, "id", "op", Seq("seq"), retainCommits = 3)

    def at(b: Long): Map[Long, String] =
      UpsertSink.readTableAt(spark, table, b).map(
        _.select($"id", $"payload").as[(Long, String)].collect().toMap)
        .getOrElse(Map.empty)
    assert(at(0L) == Map(1L -> "a1", 2L -> "b1"))
    assert(at(1L) == Map(1L -> "a2", 2L -> "b1", 3L -> "c1"))
    assert(at(2L) == Map(1L -> "a2", 3L -> "c1"))
    assert(at(99L) == at(2L), "as-of past the head resolves the latest commit")
    assert(UpsertSink.commitHistory(table).map(_.batchId) == Seq(0L, 1L, 2L))
    // every retained commit still names only existing bucket version dirs
    UpsertSink.commitHistory(table).foreach(_.versions.foreach { case (b, v) =>
      assert(new java.io.File(s"$table/buckets/b=$b/$v").isDirectory)
    })

    // a 4th batch with retainCommits=2 shrinks the horizon: commit 0 and 1
    // are pruned, their exclusive versions gone, and a too-far readTableAt
    // is None rather than a partial state
    UpsertSink.applyBatch(batchDf((4L, "d1", "I", 6L)),
      3L, table, "id", "op", Seq("seq"), retainCommits = 2)
    assert(UpsertSink.commitHistory(table).map(_.batchId) == Seq(2L, 3L))
    assert(UpsertSink.readTableAt(spark, table, 1L).isEmpty,
      "history beyond the retention horizon must not resolve")
    assert(at(3L) == Map(1L -> "a2", 3L -> "c1", 4L -> "d1"))
  }

  test("lost commit log with surviving bucket data fails fast instead of truncating") {
    val base = tmpDir("graft-usink4-")
    val table = s"$base/table"
    UpsertSink.applyBatch(
      Seq((1L, "a1", "I", 1L)).toDF("id", "payload", "op", "seq"),
      0L, table, "id", "op", Seq("seq"))
    // simulate an operator deleting the commit log out from under the table
    val deleted = new scala.reflect.io.Directory(new java.io.File(s"$table/commits")).deleteRecursively()
    assert(deleted)
    val e = intercept[IllegalStateException] {
      UpsertSink.applyBatch(
        Seq((2L, "b1", "I", 2L)).toDF("id", "payload", "op", "seq"),
        1L, table, "id", "op", Seq("seq"))
    }
    assert(e.getMessage.contains("no commit"))
  }

  test("out-of-range nBuckets fails fast (driver state is O(nBuckets))") {
    val base = tmpDir("graft-usink-nb-")
    def batchDf(rows: (Long, String, String, Long)*) =
      rows.toDF("id", "payload", "op", "seq")
    for (bad <- Seq(0, -4, (1 << 20) + 1)) {
      val e = intercept[IllegalArgumentException] {
        UpsertSink.applyBatch(batchDf((1L, "a1", "I", 1L)),
          0L, s"$base/t$bad", "id", "op", Seq("seq"), nBuckets = bad)
      }
      assert(e.getMessage.contains("nBuckets"), e.getMessage)
    }
    // the max itself is accepted — the bound is a cap, not a cliff
    UpsertSink.applyBatch(batchDf((1L, "a1", "I", 1L)),
      0L, s"$base/ok", "id", "op", Seq("seq"), nBuckets = 1 << 20)
    assert(tableState(s"$base/ok") == Map(1L -> "a1"))
  }

  test("nBucketsFor provisions bucket bytes, floors, caps, and round-trips the resize path") {
    import UpsertSink.nBucketsFor
    // small tables floor at 16; growth tracks 256 MB buckets; the 2^20
    // driver-state cap holds (256 TB at the default target)
    assert(nBucketsFor(0L) == 16)
    assert(nBucketsFor(200L << 20) == 16) // 200 MB table → floor
    assert(nBucketsFor(100L << 30) == 400) // 100 GB / 256 MB
    assert(nBucketsFor(100L * (1L << 40)) == 409600) // 100 TB
    assert(nBucketsFor(1000L * (1L << 40)) == (1 << 20)) // capped
    assert(nBucketsFor(1L << 30, targetBucketBytes = 1L << 20) == 1024)
    intercept[IllegalArgumentException](nBucketsFor(-1L))
    intercept[IllegalArgumentException](nBucketsFor(1L, targetBucketBytes = 0L))

    // resize path: rebuild into a NEW generation at the derived count —
    // the old table reads out, writes through a fresh sink, and the new
    // commit is pinned at the new bucket count
    val base = tmpDir("graft-usink-resize-")
    def batchDf(rows: (Long, String, String, Long)*) =
      rows.toDF("id", "payload", "op", "seq")
    UpsertSink.applyBatch(batchDf((1L, "a", "I", 1L), (2L, "b", "I", 1L)),
      0L, s"$base/gen1", "id", "op", Seq("seq"), nBuckets = 4)
    import org.apache.spark.sql.functions.lit
    val gen1 = UpsertSink.readTable(spark, s"$base/gen1").get
    UpsertSink.applyBatch(gen1.withColumn("op", lit("I")).withColumn("seq", lit(0L)),
      0L, s"$base/gen2", "id", "op", Seq("seq"), nBuckets = 32)
    assert(tableState(s"$base/gen2") == Map(1L -> "a", 2L -> "b"))
    // subsequent batches keep working against the new generation
    UpsertSink.applyBatch(batchDf((2L, "b2", "U", 2L)),
      1L, s"$base/gen2", "id", "op", Seq("seq"), nBuckets = 32)
    assert(tableState(s"$base/gen2") == Map(1L -> "a", 2L -> "b2"))
  }

  test("a batch rewrites only the buckets its keys touch") {
    import org.apache.spark.sql.functions.{concat, hash, lit, pmod, col}
    val base = tmpDir("graft-usink-local-")
    val table = s"$base/table"
    val nb = 8
    def rows(ids: Seq[Long], tag: String, seq: Long) =
      ids.toDF("id").withColumn("payload", concat(lit(tag), col("id")))
        .withColumn("op", lit("U")).withColumn("seq", lit(seq))
    // batch 0: 200 keys spread over all 8 buckets
    UpsertSink.applyBatch(rows(0L until 200L, "p", 0L), 0L, table,
      "id", "op", Seq("seq"), nBuckets = nb)
    val key = 7L
    val touched = Seq(key).toDF("id")
      .select(pmod(hash(col("id")), lit(nb))).head.getInt(0)
    // batch 1: a single-key update — exactly one bucket may gain a version
    UpsertSink.applyBatch(rows(Seq(key), "q", 1L), 1L, table,
      "id", "op", Seq("seq"), nBuckets = nb)
    (0 until nb).foreach { b =>
      val versions = new java.io.File(s"$table/buckets/b=$b")
        .list().toSeq.filter(_.startsWith("v-")).sorted
      if (b == touched)
        assert(versions.contains("v-0000000001"),
          s"touched bucket $b missing the batch-1 version")
      else
        assert(versions == Seq("v-0000000000"),
          s"untouched bucket $b was rewritten: $versions")
    }
    val state = tableState(table)
    assert(state(key) == s"q$key" && state(0L) == "p0" && state.size == 200)
  }

  private def tableState(dir: String): Map[Long, String] =
    UpsertSink.readTable(spark, dir).map(
      _.select($"id", $"payload").as[(Long, String)].collect().toMap)
      .getOrElse(Map.empty)

  private def historyAt(table: String, b: Long): Map[Long, String] =
    UpsertSink.readTableAt(spark, table, b).map(
      _.select($"id", $"payload").as[(Long, String)].collect().toMap)
      .getOrElse(Map.empty)

  private def rawBucketIds(table: String): Set[Long] =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$table/buckets")
      .select($"id").as[Long].collect().toSet

  test("eraseKeys scrubs the latest table, EVERY retained commit, and the raw bytes") {
    val base = tmpDir("graft-userase-")
    val table = s"$base/table"
    def batchDf(rows: (Long, String, String, Long)*) =
      rows.toDF("id", "payload", "op", "seq")
    UpsertSink.applyBatch(batchDf((10L, "v0", "I", 1L), (1L, "a0", "I", 2L),
      (2L, "b0", "I", 3L)), 0L, table, "id", "op", Seq("seq"), retainCommits = 3)
    UpsertSink.applyBatch(batchDf((10L, "v1", "U", 4L), (3L, "c1", "I", 5L)),
      1L, table, "id", "op", Seq("seq"), retainCommits = 3)
    UpsertSink.applyBatch(batchDf((1L, "a2", "U", 6L)),
      2L, table, "id", "op", Seq("seq"), retainCommits = 3)
    // fixture: the victim is servable at every retained cutoff — a CDC
    // delete would only fix the latest, which is exactly the r13 hole
    (0L to 2L).foreach(b => assert(historyAt(table, b).contains(10L)))

    val stats = UpsertSink.eraseKeys(spark, table, "id", Seq(10L).toDF("id"))
    assert(stats.versionsRewritten > 0, s"$stats")
    assert(stats.commitsRewritten > 0, s"$stats")
    // latest and every retained commit: victim gone, survivors EXACT
    assert(tableState(table) == Map(1L -> "a2", 2L -> "b0", 3L -> "c1"))
    assert(historyAt(table, 0L) == Map(1L -> "a0", 2L -> "b0"))
    assert(historyAt(table, 1L) == Map(1L -> "a0", 2L -> "b0", 3L -> "c1"))
    assert(historyAt(table, 2L) == Map(1L -> "a2", 2L -> "b0", 3L -> "c1"))
    // history structure intact: same commit ids, same depth
    assert(UpsertSink.commitHistory(table).map(_.batchId) == Seq(0L, 1L, 2L))
    // bytes GONE: a raw recursive read of every bucket file has no victim
    assert(!rawBucketIds(table).contains(10L), "erased id still byte-present")
    // every retained commit still names only existing version dirs
    UpsertSink.commitHistory(table).foreach(_.versions.foreach { case (b, v) =>
      assert(new java.io.File(s"$table/buckets/b=$b/$v").isDirectory,
        s"commit names missing b=$b/$v")
    })
    // idempotent: a second erase finds nothing
    val again = UpsertSink.eraseKeys(spark, table, "id", Seq(10L).toDF("id"))
    assert(again == UpsertSink.EraseStats(0, 0, 0), s"$again")
    // and the table is still writable afterwards
    UpsertSink.applyBatch(batchDf((4L, "d0", "I", 7L)),
      3L, table, "id", "op", Seq("seq"), retainCommits = 3)
    assert(tableState(table) ==
      Map(1L -> "a2", 2L -> "b0", 3L -> "c1", 4L -> "d0"))
  }

  test("a version erased to emptiness is dropped; empty history still resolves") {
    val base = tmpDir("graft-userase2-")
    val table = s"$base/table"
    def batchDf(rows: (Long, String, String, Long)*) =
      rows.toDF("id", "payload", "op", "seq")
    // commit 0 holds ONLY the victim — its bucket version erases to empty
    UpsertSink.applyBatch(batchDf((10L, "v0", "I", 1L)),
      0L, table, "id", "op", Seq("seq"), retainCommits = 3)
    UpsertSink.applyBatch(batchDf((20L, "w0", "I", 2L)),
      1L, table, "id", "op", Seq("seq"), retainCommits = 3)
    val stats = UpsertSink.eraseKeys(spark, table, "id", Seq(10L).toDF("id"))
    assert(stats.versionsDropped > 0, s"$stats")
    assert(tableState(table) == Map(20L -> "w0"))
    // as-of commit 0 is now an EMPTY table state, not an error and not None
    assert(historyAt(table, 0L) == Map.empty)
    assert(UpsertSink.readTableAt(spark, table, 0L).isDefined,
      "an all-erased retained commit must still resolve (empty)")
    assert(!rawBucketIds(table).contains(10L))
  }

  test("eraseKeys stabilizes against a live upsert stream (other ids compose)") {
    val base = tmpDir("graft-userase3-")
    val table = s"$base/table"
    def batchDf(rows: (Long, String, String, Long)*) =
      rows.toDF("id", "payload", "op", "seq")
    UpsertSink.applyBatch(batchDf((10L, "v0", "I", 1L), (1L, "a0", "I", 2L)),
      0L, table, "id", "op", Seq("seq"), retainCommits = 3)
    // a "live stream" landing batches of OTHER ids while the erase runs.
    // The writer ids are picked from buckets DISJOINT from the victim's
    // (like the IndexErase race spec's disjoint trees): a merge of the
    // victim's own bucket concurrent with the erase could legitimately
    // carry pre-erase rows forward — that's the documented
    // erase-after-last-ingest / re-run-after-settle contract, not a bug —
    // while the races under test here (commit scrub vs commit write vs
    // version sweep: dangling references, lost batches) must compose.
    val victimBucket = Seq(10L).toDF("id")
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"id"),
        org.apache.spark.sql.functions.lit(16)))
      .head.getInt(0)
    val writerIds = (100L to 200L).filter { i =>
      Seq(i).toDF("id").select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"id"),
        org.apache.spark.sql.functions.lit(16))).head.getInt(0) != victimBucket
    }.take(3)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writer = new Thread(() => {
      writerIds.zipWithIndex.foreach { case (id, i) =>
        val b = i + 1L
        var done = false
        var tries = 0
        while (!done && tries < 10) {
          tries += 1
          try {
            UpsertSink.applyBatch(batchDf((id, s"x$b", "I", 10L + b)),
              b, table, "id", "op", Seq("seq"), retainCommits = 3)
            done = true
          } catch { case _: Throwable => Thread.sleep(50) }
        }
        if (!done) errors.add(new IllegalStateException(s"batch $b never applied"))
      }
    })
    writer.start()
    val stats = UpsertSink.eraseKeys(spark, table, "id", Seq(10L).toDF("id"))
    writer.join(120000)
    assert(errors.isEmpty, s"live-stream writer failed: ${errors.peek()}")
    assert(stats.versionsRewritten + stats.versionsDropped > 0, s"$stats")
    val finalState = tableState(table)
    assert(!finalState.contains(10L), s"victim resurrected: $finalState")
    assert(finalState == Map(1L -> "a0") ++
      writerIds.zipWithIndex.map { case (id, i) => id -> s"x${i + 1}" }.toMap,
      s"$finalState")
    assert(!rawBucketIds(table).contains(10L), "victim bytes survive on disk")
    // every retained commit resolves whole (no dangling version reference)
    UpsertSink.commitHistory(table).foreach(_.versions.foreach { case (b, v) =>
      assert(new java.io.File(s"$table/buckets/b=$b/$v").isDirectory,
        s"dangling version reference b=$b/$v")
    })
    (0L to 3L).foreach(b => assert(!historyAt(table, b).contains(10L),
      s"victim servable as-of $b"))
  }

  test("schema evolution: add/remove columns across batches; history schema-stable; type change refused") {
    val base = tmpDir("graft-upsevo-")
    val table = s"$base/t"
    UpsertSink.applyBatch(
      Seq((1L, "a", "U", 1L), (2L, "b", "U", 2L)).toDF("id", "v", "op", "seq"),
      0L, table, "id", "op", Seq("seq"), nBuckets = 4, retainCommits = 3)
    // batch 1 GROWS a column: pre-evolution the merge silently dropped it
    UpsertSink.applyBatch(
      Seq((2L, "b2", 7L, "U", 10L), (3L, "c", 8L, "U", 11L))
        .toDF("id", "v", "w", "op", "seq"),
      1L, table, "id", "op", Seq("seq"), retainCommits = 3)
    val t1 = UpsertSink.readTable(spark, table).get
    assert(t1.columns.toSet == Set("id", "v", "w"))
    assert(t1.select($"id", $"v", $"w").as[(Long, String, Option[Long])]
      .collect().toSet ==
      Set((1L, "a", None), (2L, "b2", Some(7L)), (3L, "c", Some(8L))),
      "old rows must read the new column as null; updated rows carry it")
    // batch 2 DROPS a column (upstream removed it): the sink must not fail,
    // and the table keeps the column (null for the new rows)
    UpsertSink.applyBatch(
      Seq((4L, 9L, "U", 20L)).toDF("id", "w", "op", "seq"),
      2L, table, "id", "op", Seq("seq"), retainCommits = 3)
    val t2 = UpsertSink.readTable(spark, table).get
    assert(t2.columns.toSet == Set("id", "v", "w"))
    assert(t2.where($"id" === 4L).select($"v", $"w")
      .as[(Option[String], Option[Long])].head() == (None, Some(9L)))
    assert(t2.where($"id" === 2L).select($"v").as[String].head() == "b2",
      "a dropped feed column must not erase existing values")
    // TIME TRAVEL stays schema-stable: each commit reads under ITS schema
    val h0 = UpsertSink.readTableAt(spark, table, 0L).get
    assert(h0.columns.toSet == Set("id", "v"), h0.columns.mkString(","))
    assert(h0.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    val h1 = UpsertSink.readTableAt(spark, table, 1L).get
    assert(h1.columns.toSet == Set("id", "v", "w"))
    assert(h1.where($"id" === 1L).select($"w").as[Option[Long]].head().isEmpty)
    // a TYPE change is refused loudly (in-place widening would leave
    // untouched buckets un-widened), with the rebuild recipe in the message
    val e = intercept[IllegalStateException] {
      UpsertSink.applyBatch(
        Seq((5L, 1.5d, "U", 30L)).toDF("id", "w", "op", "seq"),
        3L, table, "id", "op", Seq("seq"), retainCommits = 3)
    }
    assert(e.getMessage.contains("TYPE") && e.getMessage.contains("rebuild"),
      e.getMessage)
    // the refused batch left no commit behind; the table still reads
    assert(UpsertSink.currentCommit(table).get.batchId == 2L)
    assert(UpsertSink.readTable(spark, table).get.count() == 4)
  }

  test("rebuildTable: resize + type widening as one call; tombstones carry over") {
    import org.apache.spark.sql.types.LongType
    val base = tmpDir("graft-upsrb-")
    val t1 = s"$base/t1"
    val t2 = s"$base/t2"
    UpsertSink.applyBatch(
      Seq((1L, "a", 1), (2L, "b", 2), (3L, "c", 3))
        .toDF("id", "v", "w")
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", $"id"),
      0L, t1, "id", "op", Seq("seq"), nBuckets = 4)
    UpsertSink.eraseKeys(spark, t1, "id", Seq(2L).toDF("id"))
    // one call: new generation at 16 buckets with w widened int -> long
    UpsertSink.rebuildTable(spark, t1, t2, "id", nBuckets = 16,
      castTo = Map("w" -> LongType))
    val nt = UpsertSink.readTable(spark, t2).get
    assert(nt.schema("w").dataType == LongType, nt.schema.simpleString)
    assert(nt.select($"id", $"v", $"w").as[(Long, String, Long)]
      .collect().toSet == Set((1L, "a", 1L), (3L, "c", 3L)))
    assert(UpsertSink.currentCommit(t2).get.nBuckets == 16)
    // the widened table accepts long-typed feeds (the refusal is gone)
    UpsertSink.applyBatch(
      Seq((4L, "d", 9L, "U", 50L)).toDF("id", "v", "w", "op", "seq"),
      1L, t2, "id", "op", Seq("seq"))
    assert(UpsertSink.readTable(spark, t2).get.where($"id" === 4L).count() == 1)
    // tombstones carried: the erased subject stays dropped in the NEW
    // generation (replay guard continuity across the swap)
    UpsertSink.applyBatch(
      Seq((2L, "boo", 9L, "U", 60L)).toDF("id", "v", "w", "op", "seq"),
      2L, t2, "id", "op", Seq("seq"))
    assert(UpsertSink.readTable(spark, t2).get.where($"id" === 2L).count() == 0,
      "a carried tombstone must keep dropping the erased subject")
    // misuse refused: rebuilding ONTO an existing generation, or casting a
    // column that does not exist
    val e1 = intercept[IllegalArgumentException] {
      UpsertSink.rebuildTable(spark, t1, t2, "id", nBuckets = 8)
    }
    assert(e1.getMessage.contains("FRESH generation"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      UpsertSink.rebuildTable(spark, t1, s"$base/t3", "id", nBuckets = 8,
        castTo = Map("nope" -> LongType))
    }
    assert(e2.getMessage.contains("absent columns"), e2.getMessage)
    // the old generation is untouched (readers swap when ready)
    assert(UpsertSink.readTable(spark, t1).get.count() == 2)
  }
}
