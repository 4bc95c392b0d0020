package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Upsert

/** Streaming CDC upsert sink (K7/K8 streaming form): maintain a keyed table
  * under `tableDir`, applying each micro-batch of changes with the staged
  * merge (`Upsert.applyChanges`) and publishing via atomic snapshot swap —
  * the "zero-downtime upsert" contract (README.md:571-575): readers see
  * either the previous snapshot or the new one, never a partial state.
  *
  * Layout: `tableDir/current` is a symlink-free pointer file naming the
  * live snapshot directory (`snap-<batchId>`); each batch writes a full new
  * snapshot then atomically rewrites the pointer. Old snapshots are pruned
  * (keep last 2 for in-flight readers).
  *
  * Scale note: the merge shuffles only on the key; a full-snapshot rewrite
  * is the built-ins-only equivalent of a Delta/Iceberg MERGE — at very
  * large table sizes you'd partition the snapshot by key range and rewrite
  * only touched partitions (same protocol, finer granularity).
  */
object UpsertSink {

  def currentSnapshot(tableDir: String): Option[String] = {
    val p = Paths.get(tableDir, "current")
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  /** Read the live table state (empty schema-less read when no snapshot). */
  def readTable(spark: SparkSession, tableDir: String): Option[DataFrame] =
    currentSnapshot(tableDir).map(s => spark.read.parquet(s"$tableDir/$s"))

  /** Start the streaming upsert: `changes` must carry `keyCol`, `opCol`
    * (I/U/D) and `seqCols` plus the table's value columns.
    */
  def start(changes: DataFrame, tableDir: String, checkpointDir: String,
      keyCol: String, opCol: String, seqCols: Seq[String],
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    Files.createDirectories(Paths.get(tableDir))
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, tableDir, keyCol, opCol, seqCols)
      }
      .start()
  }

  private[streaming] def applyBatch(batch: DataFrame, batchId: Long, tableDir: String,
      keyCol: String, opCol: String, seqCols: Seq[String]): Unit = {
    // Replay idempotence: the pointer encodes the batch id of the snapshot
    // it names. A crash between pointer swap and checkpoint commit replays
    // the SAME batch id — skip it (re-applying would double-apply and
    // overwrite the snapshot the merge plan reads from). A pointer AHEAD of
    // the incoming batch id means a fresh checkpoint is replaying history
    // into an already-advanced table — fail fast rather than corrupt it
    // (reprocess into a fresh tableDir instead).
    val current = currentSnapshot(tableDir)
    val thisSnap = f"snap-$batchId%010d"
    if (current.contains(thisSnap)) return
    if (current.exists(_ > thisSnap))
      throw new IllegalStateException(
        s"UpsertSink at $tableDir is at ${current.get} but received replayed batch " +
          s"$batchId from an older/reset checkpoint; reprocessing into an existing " +
          "table is not supported — use a fresh tableDir (and checkpoint) to rebuild")
    val spark = batch.sparkSession
    val tableCols = batch.columns.filterNot(c => c == opCol || seqCols.contains(c))
    val target = readTable(spark, tableDir).getOrElse(
      batch.select(tableCols.map(org.apache.spark.sql.functions.col): _*).limit(0))
    val merged = Upsert.applyChanges(target, batch, keyCol, opCol, seqCols: _*)

    val snapName = f"snap-$batchId%010d"
    // 1. write the full new snapshot (PUT #1 — invisible until pointed to)
    merged.write.mode("overwrite").parquet(s"$tableDir/$snapName")
    // 2. atomically repoint (PUT #2 — the commit)
    val tmp = Paths.get(tableDir, s".current-$batchId.tmp")
    Files.writeString(tmp, snapName)
    Files.move(tmp, Paths.get(tableDir, "current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // 3. prune old snapshots, keeping the previous one for in-flight readers
    val keep = Set(snapName) ++ prevSnapshot(tableDir, snapName)
    Option(new java.io.File(tableDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("snap-") && !keep(f.getName))
      .foreach(deleteRecursively)
  }

  private def prevSnapshot(tableDir: String, current: String): Set[String] =
    Option(new java.io.File(tableDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("snap-") && f.getName < current)
      .sortBy(_.getName).lastOption.map(_.getName).toSet

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
