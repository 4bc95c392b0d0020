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
    val tag = java.util.UUID.randomUUID().toString.take(12)
    keys.toDF(keyCol).distinct().coalesce(1)
      .write.mode("overwrite").parquet(s"${dirFor(store, keyCol)}/set-$tag")
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
}
