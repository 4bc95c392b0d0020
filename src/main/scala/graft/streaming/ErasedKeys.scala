package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Erasure TOMBSTONES — the replay guard the erase family needs to be
  * total over time, not just over space (r13 verdict ask #2). The erase
  * contract is "erase after the id's last ingest", but Structured
  * Streaming is at-least-once: a batch that crashed between its sink work
  * and its checkpoint commit REPLAYS, and if it carried an erased id the
  * replay silently re-introduces it into the lake or an index. Nothing
  * detected that — the remedy was "re-run the erase", which presumes the
  * operator noticed.
  *
  * Every erase entry point ([[Erase.eraseKeys]], the [[IndexErase]]
  * family, [[UpsertSink.eraseKeys]]) now persists the erased keys in an
  * `_erased/key=<col>/` sidecar under the store it erased (underscore
  * prefix: invisible to Spark directory reads and the FsOps walkers).
  * Ingest paths PROBE it — a broadcast anti-join, the decontamination
  * shape, zero cost when no sidecar exists — and drop-and-log (or fail,
  * per config) rows carrying a tombstoned key, so a crash-replay cannot
  * resurrect an erased subject.
  *
  * Consequence, by design: a GENUINE re-ingest of an erased key is
  * indistinguishable from a replay and is dropped too, until the
  * tombstone is deliberately cleared ([[clear]]). That is the safe
  * default for subject erasure — "this id must not reappear" — and the
  * dedup note on [[IndexErase.eraseFingerprints]] (re-ingest classifies
  * as new) now applies only once the tombstone is cleared.
  *
  * Scale: tombstone batches are GDPR-request-sized; each [[record]] lands
  * one small parquet set, [[fold]] keeps the listing O(1) (same posture
  * as the index delta compaction — duplicates between sets are harmless,
  * probes are semi-joins).
  */
object ErasedKeys {

  private def dirFor(store: String, keyCol: String) =
    s"$store/_erased/key=$keyCol"

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Persist `keys` (single column, any type) as erased under `store`.
    * Append-only and idempotent in effect: each call writes its own set
    * dir; duplicate keys across sets change nothing (probes are
    * semi-joins). Never fails the caller's erase on an empty key set.
    */
  def record(spark: SparkSession, store: String, keyCol: String,
      keys: DataFrame): Unit = {
    // persist: the emptiness probe and the write are two actions over a
    // possibly-derived frame — without it the scan+distinct runs twice
    val mat = keys.toDF(keyCol).distinct().persist()
    try {
      // an empty set is a no-op, not a sidecar: recording it would arm a
      // vacuous guard (probe cost + "guard active" logs on every ingest,
      // tombstoned=true in certificates) for zero erased keys — the
      // recovery-path convention of calling an erase with no keys must not
      // leave that behind
      if (mat.isEmpty) return
      val tag = java.util.UUID.randomUUID().toString.take(12)
      mat.coalesce(1)
        .write.mode("overwrite").parquet(s"${dirFor(store, keyCol)}/set-$tag")
    } finally { mat.unpersist(); () }
  }

  /** The distinct tombstoned keys for `store`/`keyCol`, or None when no
    * sidecar exists (the common case — callers skip all probe work).
    */
  def read(spark: SparkSession, store: String,
      keyCol: String): Option[DataFrame] = {
    val d = dirFor(store, keyCol)
    val (fs, p) = fsFor(spark, d)
    if (!FsOps.anyParquet(fs, p, skipHidden = true)) None
    else Some(spark.read.option("recursiveFileLookup", "true").parquet(d)
      .toDF(keyCol).distinct())
  }

  /** Fold all tombstone sets into one (maintenance — the listing must not
    * grow with erase-request count). Crash-safe by write order: promote
    * the merged set before deleting the olds; the window is
    * "duplicates visible", which probes tolerate.
    */
  def fold(spark: SparkSession, store: String, keyCol: String): Int = {
    val d = dirFor(store, keyCol)
    val (fs, p) = fsFor(spark, d)
    if (!fs.exists(p)) return 0
    val sets = fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("set-"))
    if (sets.size <= 1) return 0
    val stage = new HPath(p, ".fold-stage")
    spark.read.parquet(sets.map(_.toString): _*).toDF(keyCol).distinct()
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val merged = new HPath(p, s"set-${java.util.UUID.randomUUID().toString.take(12)}")
    FsOps.renameOrThrow(fs, stage, merged)
    sets.foreach(s => FsOps.deleteOrThrow(fs, s, recursive = true))
    sets.size
  }

  /** Deliberately clear the tombstones (e.g. to allow a genuine re-ingest
    * of previously-erased content). Returns whether a sidecar existed.
    */
  def clear(spark: SparkSession, store: String, keyCol: String): Boolean = {
    val (fs, p) = fsFor(spark, dirFor(store, keyCol))
    val existed = fs.exists(p)
    FsOps.deleteOrThrow(fs, p, recursive = true)
    existed
  }

  /** Drop rows whose `dfCol` is tombstoned under `store`. No sidecar →
    * `df` unchanged, zero cost. The probe is a broadcast anti-join
    * (tombstone sets are request-sized); `what` labels the log line.
    */
  def dropErased(df: DataFrame, store: String, keyCol: String,
      dfCol: String, what: String): DataFrame =
    read(df.sparkSession, store, keyCol) match {
      case None => df
      case Some(tomb) =>
        System.err.println(s"[graft] erased-key guard active on $what " +
          s"($store, key=$keyCol): rows matching a tombstone are dropped")
        df.join(broadcast(tomb.withColumnRenamed(keyCol, dfCol)),
          Seq(dfCol), "left_anti")
    }

  /** The RECEIPTED sink guard shared by [[Deliver]] and [[UpsertSink]]:
    * drop rows whose `keyCol` is tombstoned under `store`, with a
    * per-batch audit record of what was dropped (`receiptCols`, written
    * idempotently by overwrite under `_erased/dropped/batch=<id>`), or —
    * `failOnHit` — fail the batch loudly (the stop-the-line posture).
    * Returns `df` unchanged when no tombstones exist.
    */
  def guardWithReceipt(df: DataFrame, store: String, keyCol: String,
      receiptCols: Seq[String], batchId: Long, failOnHit: Boolean,
      what: String): DataFrame =
    read(df.sparkSession, store, keyCol) match {
      case None => df
      case Some(tomb) =>
        val dropped = df.join(broadcast(tomb), Seq(keyCol), "left_semi")
          .select(receiptCols.map(col): _*).persist()
        try {
          val n = dropped.count()
          if (n > 0) {
            if (failOnHit)
              throw new IllegalStateException(
                s"$what batch $batchId carries $n row(s) whose '$keyCol' is " +
                  s"GDPR-erased (tombstoned under $store/_erased) — a replay or " +
                  "upstream re-delivery is resurrecting erased subjects; " +
                  "the fail-on-hit guard halts the sink instead of dropping")
            dropped.write.mode("overwrite")
              .parquet(s"$store/_erased/dropped/batch=$batchId")
            System.err.println(s"[graft] $what batch-$batchId erased-key guard " +
              s"DROPPED $n row(s) with tombstoned '$keyCol' (audit: " +
              s"$store/_erased/dropped/batch=$batchId)")
            df.join(broadcast(tomb), Seq(keyCol), "left_anti")
          } else df
        } finally { dropped.unpersist(); () }
    }

  /** Opportunistic [[fold]] under the store's maintenance try-lock: a fold
    * deletes set files a concurrent probe may have just listed, so it only
    * runs when no maintenance writer holds the store — busy or failed →
    * skip (sets accumulate until the next chance). Called after each
    * [[record]] by the erase entry points and at the deliver sink's
    * cadence, so the sidecar listing stays O(1) in erase-request count on
    * EVERY guarded store, not just the lake.
    */
  def foldIfQuiet(spark: SparkSession, store: String, keyCol: String,
      lock: LockProvider = FsLeaseLock): Unit =
    try {
      val (fs, p) = fsFor(spark, store)
      // cheap pre-check BEFORE any lock traffic: the common case (no
      // sidecar, or already folded) must not pay mkdir/create/delete of a
      // _compact/lock — a deliver stream runs this on up to three stores
      // every cadence batch, erasure activity or not
      val d = new HPath(dirFor(store, keyCol))
      val nSets =
        if (!fs.exists(d)) 0
        else fs.listStatus(d).count(_.getPath.getName.startsWith("set-"))
      if (nSets > 1) {
        if (lock.tryWithLock(fs, p, Compact.DefaultLeaseMs) {
          fold(spark, store, keyCol)
        }.isEmpty)
          System.err.println(s"[graft] tombstone self-fold skipped on $store: " +
            "a maintenance writer holds the store lock")
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[graft] WARNING: tombstone self-fold failed on " +
        s"$store (${e.getMessage}) — sets accumulate until ErasedKeys.fold")
    }
}
