package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Single-writer lock for the lake maintenance family
  * (Compact/Backfill/Erase/Retention share `_compact/` control files and
  * assume ONE writer — see [[Compact]]). The provider is a SEAM, the same
  * pattern as the ingest backend (`sources/StreamIngest`): the offline
  * build and any HDFS/local deployment use [[FsLeaseLock]] (exact
  * create-if-absent + rename atomicity there); a deployment on bare S3 —
  * where neither `create(overwrite=false)` nor `rename` is conditional-PUT
  * atomic — swaps ONE argument on the maintenance entry points:
  *
  * {{{
  * // reference implementation for conditional-PUT object stores (S3
  * // If-None-Match/If-Match, GCS generation-match, Azure ETag):
  * val lock = new ConditionalPutLockProvider(myS3ConditionalStore)
  * Compact.run(spark, lakeDir, manifestDir = m, lock = lock)
  * // or any external lock service (DynamoDB conditional writes,
  * // ZooKeeper, etcd, a database row):
  * object MyLock extends LockProvider {
  *   def withLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(body: => T): T = {
  *     val lease = acquireExternal(lake.toString, leaseMs) // throws if held
  *     try body finally lease.release()
  *   }
  * }
  * }}}
  *
  * Contract: `withLock` runs `body` only while holding an exclusive
  * per-lake lock, releases on completion AND failure, and must fail fast
  * (throw) rather than wait indefinitely when another live writer holds
  * the lake — the maintenance ops are idempotent and retry-safe, so the
  * caller's scheduler owns the retry policy.
  */
trait LockProvider {
  def withLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(body: => T): T

  /** Non-blocking acquire for OPPORTUNISTIC maintenance (the deliver
    * sink's manifest self-fold): run `body` under the lock if it is free,
    * None when a live writer holds it — skipping must always be safe for
    * the caller. Default: ONE delegated acquire (`withLock` is contracted
    * to fail fast on contention, never wait), with ANY non-fatal failure
    * mapped to None. A bare `withLock` implementation gives the default no
    * way to tell contention from a body error, so body errors are
    * SWALLOWED here (logged to stderr) — None always means "not done",
    * never "done". Providers with a distinguishable busy signal should
    * override so body errors propagate (see [[FsLeaseLock]],
    * [[ConditionalPutLockProvider]]). The previous probe-then-reacquire
    * default is gone: its inert first acquire transiently HELD the lock
    * (spuriously failing a concurrent locked pass) and a writer arriving
    * between the two acquires made the second one THROW out of a method
    * whose contract is "skipping must always be safe".
    */
  def tryWithLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(
      body: => T): Option[T] =
    try Some(withLock(fs, lake, leaseMs)(body))
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] tryWithLock skipped for $lake: " +
          s"${e.getMessage} (default provider cannot distinguish contention " +
          "from a body error — override tryWithLock to propagate body errors)")
        None
    }
}

/** The default provider: a lock FILE under `_compact/` with a
  * heartbeat LEASE. `fs.create(…, overwrite=false)` is atomic on HDFS and
  * local filesystems, so exactly one of two racing writers wins. While
  * held, a daemon thread refreshes the lock file's mtime every
  * `leaseMs/3`; a later writer finding a lock whose mtime is older than
  * `leaseMs` treats it as a dead writer's and RECLAIMS it — via an atomic
  * rename to a unique tombstone, so two waiters racing to reclaim the same
  * stale lock can't both win (exactly one rename succeeds; the loser fails
  * fast as if the lock were live). A lock younger than the lease is always
  * respected. `Compact.forceUnlock` remains for operator override.
  *
  * NOT safe on bare S3 (no atomic create-if-absent/rename) — plug an
  * external [[LockProvider]] there.
  */
object FsLeaseLock extends LockProvider {

  /** Non-blocking acquire: run `body` under the lease only when the lock
    * is free (or a dead writer's lease lapsed); None when a LIVE writer
    * holds it. For best-effort maintenance a stream performs
    * opportunistically (the deliver sink's manifest self-fold): skipping
    * is always safe there — incrementals accumulate until the next
    * cadence or until the maintenance pass that holds the lock folds them
    * itself — while RUNNING concurrently with a locked retire/promote
    * fold could replace it and resurrect retired files.
    */
  override def tryWithLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(
      body: => T): Option[T] =
    try Some(withLock(fs, lake, leaseMs)(body))
    catch {
      case e: IllegalStateException
          if e.getMessage != null &&
            e.getMessage.startsWith("another maintenance writer holds") =>
        None // contention is the expected no-op; body's own errors propagate
    }

  def withLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(body: => T): T = {
    val lock = Compact.ctl(lake, "lock")
    fs.mkdirs(lock.getParent)
    def acquireOnce(): Boolean =
      try { fs.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
    def reclaimStale(): Boolean = {
      val st = try Some(fs.getFileStatus(lock)) catch {
        case _: java.io.FileNotFoundException => None // holder just released
      }
      st match {
        case Some(s) if System.currentTimeMillis() - s.getModificationTime > leaseMs =>
          // Atomic rename: of N waiters seeing the same stale lock, exactly
          // one wins the reclaim; the tombstone is deleted best-effort.
          val tomb = Compact.ctl(lake, s"lock.reclaimed.${java.util.UUID.randomUUID()}")
          val won = try fs.rename(lock, tomb) catch { case _: java.io.IOException => false }
          if (won) { try fs.delete(tomb, false) catch { case _: java.io.IOException => () }; () }
          won
        case _ => false
      }
    }
    val acquired = acquireOnce() || (reclaimStale() && acquireOnce())
    if (!acquired)
      throw new IllegalStateException(
        s"another maintenance writer holds $lock (Compact/Backfill/Erase/Retention " +
          s"are single-writer per lake): wait for it to finish or for its ${leaseMs} ms " +
          "lease to lapse (a dead writer's lock self-expires), or clear it now with " +
          "Compact.forceUnlock; the next pass will recover the interrupted work")
    // Heartbeat: keep the lease alive for long passes. Failures are ignored
    // (a missed beat only matters if it persists past the lease).
    val beat = new Thread(() => {
      val interval = math.max(500L, leaseMs / 3)
      try while (!Thread.interrupted()) {
        Thread.sleep(interval)
        try fs.setTimes(lock, System.currentTimeMillis(), -1)
        catch { case _: java.io.IOException => () }
      } catch { case _: InterruptedException => () }
    }, s"graft-lock-heartbeat-$lake")
    beat.setDaemon(true)
    beat.start()
    try body finally {
      beat.interrupt()
      FsOps.deleteOrThrow(fs, lock, recursive = false)
    }
  }
}
