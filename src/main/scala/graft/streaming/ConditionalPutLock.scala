package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Reference [[LockProvider]] for object stores with CONDITIONAL writes —
  * the deployment [[FsLeaseLock]] is documented unsafe for: bare S3 has
  * no atomic create-if-absent or rename, but it HAS supported exactly two
  * conditional primitives since 2024: `If-None-Match: *` on PUT
  * (create-if-absent) and `If-Match: <etag>` on PUT/DELETE (compare-and-
  * swap against the current version). This provider needs nothing else,
  * abstracted as [[ConditionalStore]] so the same lock logic runs against
  * the in-memory mock (ConditionalPutLockSpec) or a thin S3/GCS client
  * adapter (GCS: `x-goog-if-generation-match`; Azure: `If-Match` ETag —
  * every major object store exposes the same CAS pair).
  *
  * Protocol (the DynamoDB-lock-client lease shape, on CAS alone):
  *
  *  - ACQUIRE: `putIfAbsent(key, "holder:expiry")`. If the key exists,
  *    read it; a payload whose expiry is in the past is a dead writer's —
  *    TAKE OVER with `putIfMatch` against the version just read, so N
  *    racing waiters resolve to exactly one winner (the CAS loser fails
  *    fast, the [[LockProvider]] contract). A live lease always refuses.
  *  - HEARTBEAT: while the body runs, a daemon thread CAS-extends the
  *    expiry every leaseMs/3 (tracking the version each extend returns).
  *    A failed extend means the lease lapsed AND someone took over (e.g.
  *    a long GC pause) — the LOSS IS SURFACED, not just logged: the
  *    [[Lease]] handle's `lost` flag flips, the body's thread is
  *    interrupted (aborting blocking work — a Spark action cancels on
  *    interrupt), and `withLock` re-checks the flag after the body so a
  *    body that ran to completion under a lapsed lease FAILS instead of
  *    returning success while a second writer mutates the lake. Bodies
  *    must therefore be idempotent/abortable on lease loss (maintenance
  *    ops are — the next pass recovers); long non-interruptible sections
  *    can poll `lease.lost` / call `lease.ensureHeld()` at write points.
  *  - RELEASE: `deleteIfMatch` with the last version this holder wrote —
  *    never deletes a lock a takeover now owns.
  *
  * `nowMs` is injectable for deterministic lease tests.
  */
final class ConditionalPutLockProvider(store: ConditionalStore,
    nowMs: () => Long = () => System.currentTimeMillis())
    extends LockProvider {

  private def parseExpiry(bytes: Array[Byte]): Long = {
    val s = new String(bytes, "UTF-8")
    val i = s.lastIndexOf(':')
    if (i < 0) Long.MaxValue // unparseable payload: never treat as stale
    else try s.substring(i + 1).toLong catch { case _: NumberFormatException => Long.MaxValue }
  }

  def withLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(body: => T): T =
    withLease(fs, lake, leaseMs) { lease =>
      val r = body
      // a body that ran to completion under a lapsed lease must not report
      // success: another writer may have been mutating the lake alongside
      // it — exactly the state the lock exists to prevent
      lease.ensureHeld()
      r
    }

  /** Non-blocking acquire: this provider's refuse signal is
    * distinguishable (the `refuse()` message below), so — like
    * [[FsLeaseLock]] and unlike the base-trait default — contention maps
    * to None while body errors (and a mid-body lease LOSS, which is a
    * failure of the work, not a busy lock) PROPAGATE. Without this
    * override the inherited default would swallow body errors.
    */
  override def tryWithLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(
      body: => T): Option[T] =
    try Some(withLock(fs, lake, leaseMs)(body))
    catch {
      case e: IllegalStateException
          if e.getMessage != null &&
            e.getMessage.startsWith("another maintenance writer holds") =>
        None // contention is the expected no-op; body errors propagate
    }

  /** [[withLock]] with the lease handle exposed: bodies that want finer
    * control than thread-interrupt + completion-check poll `lease.lost`
    * (or call `ensureHeld()`) at their own write points, and can pass
    * `lease.fencingToken` to stores that accept one.
    */
  def withLease[T](fs: FileSystem, lake: HPath, leaseMs: Long)(
      body: Lease => T): T = {
    // minimum-lease floor: below this the heartbeat interval (leaseMs/3,
    // ≥50 ms) leaves too little slack for scheduling jitter — a live
    // holder's lock would expire BETWEEN beats and a waiter legitimately
    // take it over mid-body
    require(leaseMs >= 300,
      s"leaseMs=$leaseMs is below the 300 ms floor: the heartbeat extends " +
        "every leaseMs/3, so a shorter lease can lapse between beats under " +
        "ordinary scheduling jitter and a waiter would take over a LIVE body")
    val key = s"${lake.toString}/.graft-maintenance-lock"
    val holder = java.util.UUID.randomUUID().toString
    def payload(): Array[Byte] = s"$holder:${nowMs() + leaseMs}".getBytes("UTF-8")
    def refuse(): Nothing = throw new IllegalStateException(
      s"another maintenance writer holds $key (conditional-PUT lease): wait for " +
        s"it to finish or for its $leaseMs ms lease to lapse — a dead writer's " +
        "lock self-expires and the next waiter takes it over atomically")
    val version = store.putIfAbsent(key, payload()).getOrElse {
      store.get(key) match {
        case Some((bytes, ver)) if parseExpiry(bytes) < nowMs() =>
          // stale: CAS takeover — of N waiters reading the same version,
          // exactly one putIfMatch succeeds; losers fail fast
          store.putIfMatch(key, payload(), ver).getOrElse(refuse())
        case Some(_) => refuse()
        case None =>
          // holder released between our putIfAbsent and get: one retry
          store.putIfAbsent(key, payload()).getOrElse(refuse())
      }
    }
    val held = new AtomicReference[String](version)
    val owner = Thread.currentThread()
    val lease = new Lease(key, held)
    val beat = new Thread(() => {
      val interval = math.max(50L, leaseMs / 3)
      try while (!Thread.interrupted()) {
        Thread.sleep(interval)
        store.putIfMatch(key, payload(), held.get()) match {
          case Some(v) => held.set(v)
          case None =>
            System.err.println(s"[graft] WARNING: lease heartbeat CAS failed " +
              s"for $key — the lease lapsed and another writer took over; " +
              "this writer's release will no-op")
            // surface the loss: flag first (so an interrupted body that
            // polls sees it), then abort the body's blocking work — two
            // maintenance writers mutating the lake concurrently is the
            // exact state this lock exists to prevent
            lease.lostFlag = true
            if (!lease.releasedFlag) owner.interrupt()
            Thread.currentThread().interrupt()
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-cput-lock-heartbeat-$lake")
    beat.setDaemon(true)
    beat.start()
    try body(lease) finally {
      // releasing: a heartbeat loss detected from here on must not
      // interrupt the owner — the body is done, and the interrupt would
      // land on whatever the CALLER runs next
      lease.releasedFlag = true
      beat.interrupt()
      // JOIN before reading held: a heartbeat mid-CAS (not sleeping, so
      // the interrupt doesn't stop it) can commit a new version AFTER the
      // main thread read held.get() — the delete would then CAS-fail and
      // leak the lock with a freshly extended lease, blocking the next
      // writer for up to a full leaseMs
      try beat.join() catch { case _: InterruptedException =>
        Thread.currentThread().interrupt() }
      // the heartbeat thread is dead now; if the loss interrupt landed in
      // the release window above (body already complete), absorb it — the
      // loss is surfaced by ensureHeld()/the caller's Lease, not by leaking
      // interrupt status into unrelated caller code
      if (lease.lostFlag) { Thread.interrupted(); () }
      store.deleteIfMatch(key, held.get())
      ()
    }
  }
}

/** Live-lease handle a [[ConditionalPutLockProvider]] body can poll.
  * `lost` flips true the moment a heartbeat CAS fails (the lease lapsed
  * and another writer took over); `fencingToken` is the store version of
  * the holder's latest extend — monotonic per key, so stores that accept
  * a token can reject a stale holder's writes outright.
  */
final class Lease private[streaming] (key: String,
    held: AtomicReference[String]) {
  @volatile private[streaming] var lostFlag = false
  @volatile private[streaming] var releasedFlag = false
  def lost: Boolean = lostFlag
  def fencingToken: String = held.get()
  /** Throw if the lease has been lost — call at write points (or rely on
    * the thread interrupt + the completion check `withLock` performs).
    */
  def ensureHeld(): Unit =
    if (lostFlag) throw new IllegalStateException(
      s"maintenance lease for $key was LOST mid-body (heartbeat CAS failed — " +
        "e.g. a pause longer than the lease): another writer has taken over " +
        "and may be mutating the lake; this body's work must be treated as " +
        "failed and retried under a fresh lock")
}

/** The two conditional primitives the lock needs, with versioned reads —
  * a direct transliteration of S3 conditional-request semantics (version
  * token = ETag).
  */
trait ConditionalStore {
  /** Create iff absent; Some(version) on success, None if the key exists. */
  def putIfAbsent(key: String, value: Array[Byte]): Option[String]
  /** Replace iff the current version is `expectVersion` (CAS);
    * Some(newVersion) on success.
    */
  def putIfMatch(key: String, value: Array[Byte], expectVersion: String): Option[String]
  /** Current (value, version), if present. */
  def get(key: String): Option[(Array[Byte], String)]
  /** Delete iff the current version is `expectVersion`; true on success. */
  def deleteIfMatch(key: String, expectVersion: String): Boolean
}

/** Mock store with exact conditional-create/CAS semantics — what the spec
  * runs the provider against; an S3 adapter implements the same four
  * calls with If-None-Match/If-Match headers.
  */
final class InMemoryConditionalStore extends ConditionalStore {
  private val map = new java.util.HashMap[String, (Array[Byte], String)]()
  private val ctr = new java.util.concurrent.atomic.AtomicLong()
  private def fresh(): String = s"v${ctr.incrementAndGet()}"

  def putIfAbsent(key: String, value: Array[Byte]): Option[String] =
    map.synchronized {
      if (map.containsKey(key)) None
      else { val v = fresh(); map.put(key, (value, v)); Some(v) }
    }

  def putIfMatch(key: String, value: Array[Byte], expectVersion: String): Option[String] =
    map.synchronized {
      Option(map.get(key)) match {
        case Some((_, ver)) if ver == expectVersion =>
          val v = fresh(); map.put(key, (value, v)); Some(v)
        case _ => None
      }
    }

  def get(key: String): Option[(Array[Byte], String)] =
    map.synchronized(Option(map.get(key)))

  def deleteIfMatch(key: String, expectVersion: String): Boolean =
    map.synchronized {
      Option(map.get(key)) match {
        case Some((_, ver)) if ver == expectVersion => map.remove(key); true
        case _ => false
      }
    }
}
