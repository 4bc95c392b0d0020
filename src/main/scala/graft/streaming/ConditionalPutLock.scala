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
  *    a long GC pause) — logged loudly; release then correctly no-ops.
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

  def withLock[T](fs: FileSystem, lake: HPath, leaseMs: Long)(body: => T): T = {
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
    val beat = new Thread(() => {
      val interval = math.max(100L, leaseMs / 3)
      try while (!Thread.interrupted()) {
        Thread.sleep(interval)
        store.putIfMatch(key, payload(), held.get()) match {
          case Some(v) => held.set(v)
          case None =>
            System.err.println(s"[graft] WARNING: lease heartbeat CAS failed " +
              s"for $key — the lease lapsed and another writer took over; " +
              "this writer's release will no-op")
            Thread.currentThread().interrupt()
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-cput-lock-heartbeat-$lake")
    beat.setDaemon(true)
    beat.start()
    try body finally {
      beat.interrupt()
      // JOIN before reading held: a heartbeat mid-CAS (not sleeping, so
      // the interrupt doesn't stop it) can commit a new version AFTER the
      // main thread read held.get() — the delete would then CAS-fail and
      // leak the lock with a freshly extended lease, blocking the next
      // writer for up to a full leaseMs
      try beat.join() catch { case _: InterruptedException =>
        Thread.currentThread().interrupt() }
      store.deleteIfMatch(key, held.get())
      ()
    }
  }
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
