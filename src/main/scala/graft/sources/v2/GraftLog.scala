package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration
import graft.streaming.{ErasedKeys, FsLeaseLock, FsOps, LockProvider}

/** The sharded-log STORE behind the `graftlog` DataSourceV2 source
  * ([[GraftLogTableProvider]]) — the durable shape of the reference's
  * stream (README.md:43-53): named shards, per-shard monotonically
  * increasing SequenceNumbers, replayable from any position.
  *
  * Layout (one directory per shard; segment files named by their own
  * metadata so ADMISSION — byte/count budgeting, offset math — is a
  * driver-side LISTING, never a data read):
  *
  * {{{
  * <dir>/<shardId>/seg-<firstSeq>-<lastSeq>-<count>-<bytes>-<uuid>.log
  * }}}
  *
  * Segment content: UTF-8 lines, TAB-separated
  * `stream \t partition_key \t sequence_number \t arrival_micros \t data`
  * (`data` is the base64 wire payload — base64 and the key contract below
  * guarantee no field contains a tab/newline). A segment is written to a
  * dot-prefixed temp name and RENAMED into place, so readers never list a
  * half-written segment.
  *
  * Log contract (what the reference's managed service guarantees, enforced
  * here by [[append]]):
  *  - a record's shard is a pure function of its partition key (producer
  *    side — [[graft.sources.ShardedLog.fromEvents]] hash-routes);
  *  - per shard, segment sequence ranges are DISJOINT and INCREASING:
  *    append() sorts each shard's rows, cuts segments at the byte budget,
  *    and refuses rows at-or-below the shard's current high-water mark.
  *    The reader re-validates (a segment straddling a committed offset is
  *    a corrupt log, refused loudly — never silently skipped or reread).
  *
  * Scale shape: one append = one Spark job whose tasks each own whole
  * shards (repartition by shard_id); listing cost is O(segments), kept
  * bounded by segment size (default 8 MB) and log retention, exactly like
  * a Kafka/Kinesis segment store.
  */
object GraftLog {

  /** One segment file's name-borne metadata. */
  final case class Segment(shard: String, path: String, firstSeq: String,
      lastSeq: String, count: Long, bytes: Long)

  private val SegName = """seg-([0-9]+)-([0-9]+)-(\d+)-(\d+)-[0-9a-f-]+\.log""".r

  def parseSegment(shard: String, p: HPath): Option[Segment] = p.getName match {
    case SegName(first, last, count, bytes) =>
      Some(Segment(shard, p.toString, first, last, count.toLong, bytes.toLong))
    case _ => None
  }

  private def segmentName(firstSeq: String, lastSeq: String, count: Long,
      bytes: Long): String =
    s"seg-$firstSeq-$lastSeq-$count-$bytes-${java.util.UUID.randomUUID()}.log"

  /** All shards' segments, sorted by firstSeq within each shard — the
    * driver-side metadata read behind offsets/admission/planning.
    */
  def listSegments(fs: FileSystem, dir: String): Map[String, Seq[Segment]] = {
    val root = new HPath(dir)
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).toSeq.filter(_.isDirectory)
      // control trees are not shards: `_erased` tombstones, `_erase`
      // intent files, dot-temps
      .filterNot(d => d.getPath.getName.startsWith("_") ||
        d.getPath.getName.startsWith("."))
      .map { shardDir =>
        val shard = shardDir.getPath.getName
        val segs = fs.listStatus(shardDir.getPath).toSeq
          .flatMap(st => parseSegment(shard, st.getPath))
          .sortBy(_.firstSeq)
        shard -> segs
      }.toMap
  }

  /** Per-shard high-water mark (max lastSeq), for producer monotonicity
    * enforcement and LATEST starting position.
    */
  def highWater(fs: FileSystem, dir: String): Map[String, String] =
    listSegments(fs, dir).collect {
      case (shard, segs) if segs.nonEmpty => shard -> segs.map(_.lastSeq).max
    }

  /** Distributed append of envelope records ([[graft.sources.ShardedLog]]
    * schema). One task per shard (repartition + sortWithinPartitions), so
    * each shard's segments are cut from ONE ordered pass — ranges disjoint
    * and increasing by construction. Records at or below a shard's current
    * high-water mark are refused (the per-shard monotonicity contract the
    * reader's offset math relies on). Concurrent appends to the SAME shard
    * are out of scope — the reference's service serializes per-shard
    * writes; run appends to one log sequentially (appends to different
    * logs, or resharded shard sets, compose freely).
    */
  def append(records: DataFrame, dir: String,
      maxSegmentBytes: Long = 8L << 20): Unit = {
    val spark = records.sparkSession
    val hconf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val fs = new HPath(dir).getFileSystem(hconf.value)
    // Interlock with [[eraseKeys]]/[[expireUpTo]] — enforced, not just
    // documented, and LockProvider-INDEPENDENT (a custom provider leaves
    // no _compact/lock to probe): maintenance writes an `_erase/active`
    // marker for its duration, re-touched just before the swap phase, so
    // an append racing the segment-swap window — which could read a
    // transiently-lowered high-water mark and mint an overlapping range
    // (permanent straddle corruption for every committed reader) — is
    // REFUSED loudly while the marker is fresh. A stale marker (dead
    // maintenance pass) is ignored; the next maintenance run sweeps it.
    // The high-water broadcast below is read ONCE, here, inside the
    // refused-if-active window — an erase STARTING later cannot lower
    // what this append already read (erases preserve declared ranges).
    try {
      val age = System.currentTimeMillis() -
        fs.getFileStatus(activeMarker(dir)).getModificationTime
      if (age <= EraseLeaseMs)
        throw new IllegalStateException(
          s"graftlog append refused: a maintenance pass (erase/retention) is " +
            s"active on $dir (marker age $age ms) — an append racing its " +
            "segment swap can corrupt per-shard offset ranges; retry after " +
            "it completes")
    } catch { case _: java.io.FileNotFoundException => () }
    val hw = highWater(fs, dir)
    val hwB = spark.sparkContext.broadcast(hw)
    // erased-key replay guard ([[ErasedKeys]]): a producer retry or
    // upstream re-delivery carrying a GDPR-erased partition key must not
    // restock the retained log after [[eraseKeys]] scrubbed it. Zero cost
    // when no tombstone sidecar exists.
    ErasedKeys.dropErased(records, dir, "partition_key", "partition_key",
      "graftlog append")
      .select(col("stream_name"), col("shard_id"), col("partition_key"),
        col("sequence_number"), unix_micros(col("approx_arrival_ts")).as("ts_us"),
        // the log stores CANONICAL base64: Spark's base64() emits
        // MIME-chunked text (CRLF every 76 chars), which cannot ride in a
        // line-oriented segment; stripping the whitespace changes the
        // presentation, not the payload (every base64 decoder accepts the
        // unchunked form)
        regexp_replace(col("data"), "\\s", "").as("data"))
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("sequence_number"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        writeShardRuns(rows, dir, hconf.value, hwB.value, maxSegmentBytes)
      }
  }

  /** Write one task's rows (sorted by shard, seq) as segments: a new
    * segment per shard change or byte-budget overflow.
    */
  private def writeShardRuns(rows: Iterator[org.apache.spark.sql.Row], dir: String,
      hconf: Configuration, highWater: Map[String, String],
      maxSegmentBytes: Long): Unit = {
    val fs = new HPath(dir).getFileSystem(hconf)
    var shard: String = null
    var buf = new java.io.ByteArrayOutputStream()
    var firstSeq: String = null
    var lastSeq: String = null
    var prevSeq: String = null // last seq of the CURRENT SHARD across segments
    var count = 0L
    def flush(): Unit = if (count > 0) {
      val shardDir = new HPath(dir, shard)
      fs.mkdirs(shardDir)
      val tmp = new HPath(shardDir, s".tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try { buf.writeTo(out) } finally out.close()
      val dest = new HPath(shardDir, segmentName(firstSeq, lastSeq, count, buf.size().toLong))
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(s"could not publish segment $dest")
      buf = new java.io.ByteArrayOutputStream()
      firstSeq = null; lastSeq = null; count = 0
    }
    rows.foreach { r =>
      val sh = r.getString(1)
      if (sh != shard) { flush(); shard = sh; prevSeq = null }
      val seq = r.getString(3)
      // duplicate sequence numbers within one append would produce
      // overlapping segment ranges — the same corruption the high-water
      // check refuses across appends
      require(prevSeq == null || seq > prevSeq,
        s"graftlog append carries duplicate sequence number $seq in shard $sh " +
          "(sequence numbers must be unique and increasing per shard)")
      prevSeq = seq
      Seq(r.getString(0), r.getString(2), seq, r.getString(5)).foreach { f =>
        require(f != null && !f.contains('\t') && !f.contains('\n') && !f.contains('\r'),
          s"graftlog field contains a tab/newline or is null (shard $sh, seq $seq): " +
            "records ride in a line-oriented segment and must not")
      }
      // monotonicity: never write at-or-below the shard's committed range —
      // the reader's offset math ("everything ≤ offset is delivered")
      // depends on it, exactly like the reference's service-assigned
      // SequenceNumbers
      highWater.get(sh).foreach { hwm =>
        require(seq > hwm,
          s"graftlog append violates per-shard monotonicity: shard $sh already " +
            s"holds sequence numbers up to $hwm but this append carries $seq — " +
            "sequence numbers must strictly increase per shard (replay the " +
            "producer with fresh sequence numbers, or write to a new log)")
      }
      if (count > 0 && buf.size() >= maxSegmentBytes) flush()
      if (count == 0) firstSeq = seq
      lastSeq = seq
      val line = s"${r.getString(0)}\t${r.getString(2)}\t$seq\t${r.getLong(4)}\t${r.getString(5)}\n"
      buf.write(line.getBytes("UTF-8"))
      count += 1
    }
    flush()
  }

  /** Outcome of [[eraseKeys]]: segments rewritten, record lines removed. */
  final case class EraseStats(segmentsRewritten: Int, linesErased: Long)

  /** The erase lease horizon — shared by [[eraseKeys]]'s lock and
    * [[append]]'s interlock so both sides agree on what "live" means.
    */
  val EraseLeaseMs: Long = 15L * 60 * 1000

  private def intentPath(dir: String) = new HPath(dir, "_erase/intent")

  /** The maintenance-active marker [[append]]'s interlock probes (written
    * by [[eraseKeys]]/[[expireUpTo]], LockProvider-independent).
    */
  private def activeMarker(dir: String) = new HPath(dir, "_erase/active")

  private def touchMarker(hconf: Configuration, fs: FileSystem,
      dir: String): Unit =
    FsOps.atomicWrite(hconf, fs, activeMarker(dir),
      "maintenance-active\n".getBytes("UTF-8"))

  private def dropMarker(fs: FileSystem, dir: String): Unit =
    FsOps.deleteOrThrow(fs, activeMarker(dir), recursive = false)

  private def readLines(fs: FileSystem, p: HPath): Vector[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
  }

  /** GDPR erasure from the RETAINED LOG itself — the copy the reference's
    * 365-day replay retention (README.md:83) keeps and every downstream
    * erase so far could not reach: until the retention window expires, a
    * replay from TRIM_HORIZON re-delivers the subjects' raw records (the
    * delivery-side guards DROP them, but the bytes stay on disk).
    *
    * Every segment holding a subject's partition key is rewritten
    * line-filtered with its DECLARED sequence range preserved (the name's
    * firstSeq/lastSeq are the log's committed geometry): per-shard offset
    * math, high-water marks, checkpointed positions, and the straddle
    * check are all unchanged — a segment erased to emptiness stays as a
    * 0-count range holder. Untouched segments are not opened twice,
    * moved, or renamed.
    *
    * Serialization domain: the log contract already serializes APPENDS
    * per log (see [[append]]); an erase is a writer in that same domain,
    * and the exclusion is ENFORCED — [[append]] refuses while the erase's
    * maintenance lease is live (an append racing the swap window of a
    * shard's LAST segment could read a transiently-lowered high-water
    * mark and mint an overlapping range — permanent straddle corruption).
    * Readers need no quiescing. The [[LockProvider]] seam additionally
    * serializes erases against each other and against recovery.
    *
    * Swap protocol per affected segment: an `_erase/intent` file lists
    * every old→new pair first; then old renames aside to
    * `.eretired-<name>` (invisible — readers only parse `seg-*` names),
    * the filtered replacement renames in, asides and intent are swept. A
    * crash recovers on the next erase: roll FORWARD where the new name
    * exists, roll BACK otherwise. A reader planning inside one segment's
    * swap window fails its micro-batch on the vanished path and replays —
    * the same restart-safe posture as the lake maintenance passes.
    *
    * Scale: one distributed pass over the log (scan + filtered rewrite in
    * the same task) — O(log bytes) read ONCE, writes proportional to
    * affected segments only. The subjects are then tombstoned at the log
    * root, so [[append]] drops a producer re-delivery instead of
    * restocking the log ([[ErasedKeys]]).
    */
  def eraseKeys(spark: SparkSession, dir: String, partitionKeys: DataFrame,
      lock: LockProvider = FsLeaseLock,
      leaseMs: Long = EraseLeaseMs): EraseStats = {
    val hconf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val root = new HPath(dir)
    val fs = root.getFileSystem(hconf.value)
    // materialize to a driver set NOW (GDPR requests are small by nature;
    // the frame may derive from the very log being rewritten)
    val keys = partitionKeys.toDF("partition_key")
      .select(col("partition_key").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val stats = lock.withLock(fs, root, leaseMs) {
      recoverErase(fs, dir)
      // arm the append interlock for the whole pass (see [[append]])
      touchMarker(hconf.value, fs, dir)
      try {
      val segs = listSegments(fs, dir).values.flatten.toSeq
      if (segs.isEmpty || keys.isEmpty) EraseStats(0, 0L)
      else {
        val keysB = spark.sparkContext.broadcast(keys)
        // one distributed pass: tasks scan their segments and, where a
        // subject line is found, write the filtered replacement to a
        // dot-temp in the shard dir (invisible until the swap below)
        val rewrites = spark.sparkContext
          .parallelize(segs, math.max(1, math.min(segs.size, 64)))
          .flatMap { s =>
            val p = new HPath(s.path)
            val tfs = p.getFileSystem(hconf.value)
            val lines = readLines(tfs, p)
            val (erased, kept) =
              lines.partition(l => keysB.value.contains(l.split('\t')(1)))
            if (erased.isEmpty) None
            else {
              val tmp = new HPath(p.getParent, s".etmp-${java.util.UUID.randomUUID()}")
              val out = tfs.create(tmp, false)
              try kept.foreach(l => out.write((l + "\n").getBytes("UTF-8")))
              finally out.close()
              val bytes = tfs.getFileStatus(tmp).getLen
              Some((s.shard, p.getName, tmp.getName,
                segmentName(s.firstSeq, s.lastSeq, kept.size.toLong, bytes),
                erased.size.toLong))
            }
          }.collect().toSeq
        if (rewrites.isEmpty) EraseStats(0, 0L)
        else {
          // re-touch before the SWAP phase: the scan above may have run
          // longer than the interlock's freshness horizon
          touchMarker(hconf.value, fs, dir)
          FsOps.atomicWrite(hconf.value, fs, intentPath(dir),
            rewrites.map { case (sh, old, tmp, nw, _) => s"$sh\t$old\t$tmp\t$nw" }
              .mkString("\n").getBytes("UTF-8"))
          rewrites.foreach { case (sh, old, tmp, nw, _) =>
            val sd = new HPath(root, sh)
            FsOps.renameOrThrow(fs, new HPath(sd, old),
              new HPath(sd, s".eretired-$old"))
            FsOps.renameOrThrow(fs, new HPath(sd, tmp), new HPath(sd, nw))
          }
          rewrites.foreach { case (sh, old, _, _, _) =>
            FsOps.deleteOrThrow(fs,
              new HPath(new HPath(root, sh), s".eretired-$old"), recursive = false)
          }
          FsOps.deleteOrThrow(fs, intentPath(dir), recursive = false)
          EraseStats(rewrites.size, rewrites.map(_._5).sum)
        }
      }
      } finally dropMarker(fs, dir)
    }
    // tombstone AFTER success (a failed erase must not declare the keys
    // gone), even when the scan was a no-op — "must not reappear" guards
    // future appends either way
    import spark.implicits._
    ErasedKeys.record(spark, dir, "partition_key", keys.toSeq.toDF("partition_key"))
    ErasedKeys.foldIfQuiet(spark, dir, "partition_key", lock)
    stats
  }

  /** Complete or roll back a crashed [[eraseKeys]] using the intent: roll
    * FORWARD a pair whose new name exists (sweep aside/temp), roll BACK
    * otherwise (restore the aside), then sweep stray dot-temps.
    */
  private def recoverErase(fs: FileSystem, dir: String): Unit = {
    val root = new HPath(dir)
    // a crashed pass leaves its append-interlock marker; sweep it (the
    // caller re-arms its own)
    if (fs.exists(activeMarker(dir))) dropMarker(fs, dir)
    val ip = intentPath(dir)
    if (fs.exists(ip)) {
      FsOps.readString(fs, ip).split('\n').filter(_.nonEmpty).foreach { l =>
        val Array(sh, old, tmp, nw) = l.split('\t')
        val sd = new HPath(root, sh)
        val aside = new HPath(sd, s".eretired-$old")
        if (fs.exists(new HPath(sd, nw))) {
          if (fs.exists(aside)) FsOps.deleteOrThrow(fs, aside, recursive = false)
        } else if (fs.exists(aside))
          FsOps.renameOrThrow(fs, aside, new HPath(sd, old))
        val t = new HPath(sd, tmp)
        if (fs.exists(t)) FsOps.deleteOrThrow(fs, t, recursive = false)
      }
      FsOps.deleteOrThrow(fs, ip, recursive = false)
    }
    if (fs.exists(root))
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
        .foreach { sd =>
          fs.listStatus(sd).map(_.getPath)
            .filter(_.getName.startsWith(".etmp-"))
            .foreach(p => FsOps.deleteOrThrow(fs, p, recursive = false))
        }
  }

  /** RETENTION: expire committed history up to `watermark` (a sequence
    * number string, inclusive) — the reference's 365-day replay retention
    * (README.md:83) as an operation, without which the log grows forever.
    * Replays from TRIM_HORIZON begin after the watermark; consumers whose
    * committed offsets are past it are unaffected; a consumer still BELOW
    * it resumes from the oldest surviving segment (records expire
    * regardless of consumption — the reference's semantics; the skipped
    * range is observable as the offset jump). Deterministic and
    * segment-granular: a segment STRADDLING the watermark is kept whole
    * (retention is a floor, not a cut).
    *
    * High-water survival: if expiry covers a shard's NEWEST segment, that
    * segment is replaced by a 0-count holder of its declared range (the
    * erase-to-emptiness trick), so producer monotonicity can never admit
    * a recycled sequence number. Crash-safe: the holder is created before
    * its original is deleted; a crash between leaves a benign 0-count
    * twin (identical range, zero extra rows) that the next expiry sweeps.
    * Runs under the same maintenance lease as [[eraseKeys]], so appends
    * are interlocked for its duration.
    *
    * Returns the number of segments removed.
    */
  def expireUpTo(spark: SparkSession, dir: String, watermark: String,
      lock: LockProvider = FsLeaseLock): Int = {
    require(watermark.nonEmpty && watermark.forall(_.isDigit),
      s"expireUpTo watermark '$watermark' must be a digit string: sequence " +
        "comparisons are lexicographic over fixed-width zero-padded numbers")
    val root = new HPath(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = root.getFileSystem(hconf)
    lock.withLock(fs, root, EraseLeaseMs) {
      recoverErase(fs, dir)
      touchMarker(hconf, fs, dir) // append interlock (see [[append]])
      try {
      var removed = 0
      listSegments(fs, dir).foreach { case (_, segs0) =>
        // WIDTH check against the log's own sequence spelling: an
        // unpadded watermark ("149" vs "000…149") compares lexically
        // below every padded seq and would silently expire the WHOLE log
        segs0.headOption.foreach(s0 => require(
          watermark.length == s0.lastSeq.length,
          s"expireUpTo watermark '$watermark' (width ${watermark.length}) " +
            s"does not match the log's sequence-number width " +
            s"(${s0.lastSeq.length}, e.g. '${s0.lastSeq}') — zero-pad it " +
            "(ShardedLog producers: f\"$seq%030d\"); an unpadded watermark " +
            "would lexically expire everything"))
        // finish a crashed expiry first: a non-empty segment with a
        // 0-count twin of the same range is half-expired — delete it
        val holderRanges = segs0.filter(_.count == 0)
          .map(s => (s.firstSeq, s.lastSeq)).toSet
        val (dupes, segs) = segs0.partition(s =>
          s.count > 0 && holderRanges((s.firstSeq, s.lastSeq)))
        dupes.foreach { s =>
          FsOps.deleteOrThrow(fs, new HPath(s.path), recursive = false)
          removed += 1
        }
        // expire data segments below the watermark AND superseded 0-count
        // holders from earlier total expiries (skipping them would leak
        // one empty segment per shard per cycle — unbounded growth in the
        // operation whose purpose is bounding the log). The shard's LAST
        // segment is the high-water carrier: a data segment there is
        // replaced by a fresh holder; an existing holder there stays.
        val expired = segs.filter(s => s.lastSeq <= watermark &&
          (s.count > 0 || s != segs.last))
        expired.foreach { s =>
          if (s == segs.last) {
            // the shard's newest segment: hold its range so the
            // high-water mark survives total expiry
            val holder = new HPath(new HPath(s.path).getParent,
              segmentName(s.firstSeq, s.lastSeq, 0, 0))
            fs.create(holder, false).close()
          }
          FsOps.deleteOrThrow(fs, new HPath(s.path), recursive = false)
          removed += 1
        }
      }
      removed
      } finally dropMarker(fs, dir)
    }
  }

  /** Raw presence scan for the erasure certificate ([[graft.streaming
    * .Erase.verify]]): count log lines carrying a subject partition key —
    * a full distributed read of every segment, no offsets, no admission
    * (a certificate trusts nothing the erase maintains).
    */
  def countKeyLines(spark: SparkSession, dir: String, keys: Set[String]): Long = {
    val hconf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val fs = new HPath(dir).getFileSystem(hconf.value)
    val segs = listSegments(fs, dir).values.flatten.toSeq
    if (segs.isEmpty || keys.isEmpty) return 0L
    val keysB = spark.sparkContext.broadcast(keys)
    spark.sparkContext.parallelize(segs, math.max(1, math.min(segs.size, 64)))
      .map { s =>
        val p = new HPath(s.path)
        readLines(p.getFileSystem(hconf.value), p)
          .count(l => keysB.value.contains(l.split('\t')(1))).toLong
      }.sum().toLong
  }
}
