package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, hash, lit, pmod, regexp_extract}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.operators.Upsert

/** Streaming CDC upsert sink (K7/K8 streaming form): maintain a keyed table
  * under `tableDir`, applying each micro-batch of changes with the staged
  * merge (`Upsert.applyChanges`) and publishing via an atomic commit-file
  * append — the "zero-downtime upsert" contract (README.md:571-575): readers
  * see either the previous commit or the new one, never a partial state.
  *
  * Commit protocol (versioned, latest-wins — there is never a moment with
  * no live commit, and a crash at ANY step leaves the previous commit
  * intact):
  *   - `commits/commit-<batchId>.json` is the full table state: bucket
  *     count, live version dir per bucket, and the table schema (so an
  *     empty table is readable without a second file).
  *   - A batch writes its new bucket version dirs first (invisible — no
  *     commit references them), then creates its commit file via temp +
  *     rename to a NEW name. Resolution reads the highest-numbered commit;
  *     older commits are pruned to the writer's `retainCommits` horizon
  *     (≥ 2) — the retained tail shields in-flight readers and serves
  *     time-travel reads ([[readTableAt]]/[[commitHistory]]).
  *   - Nothing is ever deleted before its replacement is live, so the
  *     delete-then-rename "no table" window cannot occur, and a crash
  *     between any two steps is recovered by replaying the batch.
  *
  * Scale design: the table is hash-bucketed by key
  * (`buckets/b=<i>/v-<batchId>` version dirs). A batch's keys deterministically
  * land in a bounded set of buckets, so each micro-batch reads, merges and
  * rewrites ONLY the touched buckets — O(batch ∪ touched-buckets) I/O, not
  * O(table) — then commits the new bucket→version map. Untouched buckets'
  * files are not opened, moved, or rewritten. Old versions of touched
  * buckets are pruned keeping the immediately previous one for in-flight
  * readers.
  *
  * All pointer/promotion I/O goes through Hadoop FileSystem (with
  * throw-on-false wrappers — see [[FsOps]]), so remote tableDir URIs
  * (hdfs://, s3a://) resolve against the right store and a silently failed
  * rename can never publish a commit naming missing files.
  */
object UpsertSink {

  /** Provision `nBuckets` for an expected table size (the SCALING.md rule
    * as API — r8 verdict ask #7): per-batch merge cost is touched-bucket
    * BYTES, so bucket bytes must stay bounded as the table grows. This
    * sizes buckets to ~`targetBucketBytes` (256 MB default — a comfortable
    * single-task read+merge+write unit and a healthy parquet file size),
    * floored at 16 and capped at the sink's 2^20 driver-state bound (at
    * the cap and default target, one table generation covers ~256 TB).
    *
    * Cost model the number encodes: a CONCENTRATED change batch (the
    * common CDC shape) merges in O(touched buckets × targetBucketBytes) —
    * flat as the table grows (measured: UpsertSoak hot ~2 s across 5×
    * growth). A UNIFORM batch of K keys touches min(K, nBuckets) buckets,
    * so its bound is min(K × targetBucketBytes, tableBytes) — a genuinely
    * table-wide update is an irreducible table-wide rewrite; raising
    * nBuckets past the working-set size trades that down against file
    * granularity.
    *
    * RESIZE PATH: the bucket count is pinned by the table's FIRST commit
    * (a silent change would re-key the layout and orphan every existing
    * row). To resize, build a NEW table generation — [[rebuildTable]] is
    * that as one call (one pass, I-ops, tombstones carried) — then point
    * readers at the new tableDir and retire the old one. The commit
    * protocol's atomic-latest semantics make the cutover a reader-side
    * path swap, not a data migration window.
    */
  def nBucketsFor(expectedTableBytes: Long,
      targetBucketBytes: Long = 256L << 20): Int = {
    require(expectedTableBytes >= 0 && targetBucketBytes > 0,
      s"bad sizing inputs: tableBytes=$expectedTableBytes target=$targetBucketBytes")
    val needed =
      (expectedTableBytes + targetBucketBytes - 1) / targetBucketBytes
    math.min(1L << 20, math.max(16L, needed)).toInt
  }

  /** A published table state: the batch that committed it, the bucket count
    * it was written with, the live version dir per non-empty bucket, and
    * the table schema (JSON, `StructType.json`).
    */
  final case class Commit(batchId: Long, nBuckets: Int, versions: Map[Int, String],
      schemaJson: String)

  private implicit val formats: Formats = DefaultFormats

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def commitsDir(table: HPath) = new HPath(table, "commits")

  /** Upgrade a table written by the pre-commit-log format (single `current`
    * pointer + sibling `_schema.json`): synthesize the equivalent
    * `commits/commit-<batch>.json` from the pointer, then retire the
    * pointer. Idempotent and crash-safe — the pointer is only deleted after
    * the commit file exists, and a re-run with commits already present just
    * clears the leftover pointer. Without this, the lost-commit-log guard
    * would misdiagnose a healthy legacy table as corrupted.
    */
  private def migrateLegacyPointer(fs: FileSystem,
      hconf: org.apache.hadoop.conf.Configuration, table: HPath): Unit = {
    if (!fs.exists(new HPath(table, "current"))) return
    if (listCommits(fs, table).isEmpty) readLegacy(fs, table).foreach { c =>
      fs.mkdirs(commitsDir(table))
      FsOps.atomicWrite(hconf, fs, new HPath(commitsDir(table), commitName(c.batchId)),
        renderCommit(c).getBytes("UTF-8"))
    }
    FsOps.deleteOrThrow(fs, new HPath(table, "current"), recursive = false)
    FsOps.deleteOrThrow(fs, new HPath(table, "_schema.json"), recursive = false)
  }

  /** Read-only view of a table still in the legacy single-pointer format —
    * readers must see a healthy legacy table without mutating it (a reader
    * may not own the table; migration happens on the next write).
    */
  private def readLegacy(fs: FileSystem, table: HPath): Option[Commit] = {
    val ptr = new HPath(table, "current")
    if (!fs.exists(ptr)) return None
    val j = JsonMethods.parse(FsOps.readString(fs, ptr).trim)
    val schemaFile = new HPath(table, "_schema.json")
    val schemaJson =
      if (fs.exists(schemaFile)) FsOps.readString(fs, schemaFile).trim
      else "null" // non-empty tables read schema from their parquet
    Some(Commit(
      (j \ "batch").extract[Long],
      (j \ "nbuckets").extract[Int],
      (j \ "versions").extract[Map[String, String]].map { case (b, v) => b.toInt -> v },
      schemaJson))
  }

  private def commitName(batchId: Long) = f"commit-$batchId%010d.json"

  /** All commit files under the table, (batchId, path), unsorted. */
  private def listCommits(fs: FileSystem, table: HPath): Seq[(Long, HPath)] = {
    val dir = commitsDir(table)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath).flatMap { p =>
      val n = p.getName
      if (n.startsWith("commit-") && n.endsWith(".json"))
        Some(n.stripPrefix("commit-").stripSuffix(".json").toLong -> p)
      else None
    }
  }

  /** Latest-wins resolution: the raw JSON of the highest-numbered commit. */
  private def readLatest(fs: FileSystem, table: HPath): Option[String] =
    listCommits(fs, table).maxByOption(_._1)
      .map { case (_, p) => FsOps.readString(fs, p).trim }

  private def parseCommit(json: String): Commit = {
    val j = JsonMethods.parse(json)
    Commit(
      (j \ "batch").extract[Long],
      (j \ "nbuckets").extract[Int],
      (j \ "versions").extract[Map[String, String]].map { case (b, v) => b.toInt -> v },
      JsonMethods.compact(JsonMethods.render(j \ "schema")))
  }

  private def renderCommit(c: Commit): String = {
    val obj = JObject(
      "batch" -> JLong(c.batchId),
      "nbuckets" -> JInt(c.nBuckets),
      "schema" -> JsonMethods.parse(c.schemaJson),
      "versions" -> JObject(c.versions.toSeq.sortBy(_._1)
        .map { case (b, v) => b.toString -> (JString(v): JValue) }: _*))
    JsonMethods.compact(JsonMethods.render(obj))
  }

  /** Raw latest-commit contents — an opaque commit token (changes iff the
    * table state changed; stable across replays of the same batch).
    */
  def currentSnapshot(tableDir: String): Option[String] = {
    val spark = SparkSession.active
    val (fs, table) = fsFor(spark, tableDir)
    readLatest(fs, table)
      .orElse(readLegacy(fs, table).map(renderCommit))
  }

  /** The parsed live commit, if the table has one (legacy-format tables
    * resolve read-only — see [[readLegacy]]).
    */
  def currentCommit(tableDir: String): Option[Commit] = {
    val spark = SparkSession.active
    val (fs, table) = fsFor(spark, tableDir)
    readLatest(fs, table).map(parseCommit)
      .orElse(readLegacy(fs, table))
  }

  /** Read the live table state: the union of each bucket's live version.
    * An existing but all-buckets-empty table reads as an empty frame with
    * the committed schema.
    */
  def readTable(spark: SparkSession, tableDir: String): Option[DataFrame] =
    currentCommit(tableDir).map(readCommit(spark, tableDir, _))

  /** The REBUILD path that the resize note ([[nBucketsFor]]) and the
    * type-change refusal in [[applyBatch]] point at, as one call: read the
    * live table, optionally cast to a new schema (type WIDENING — the
    * evolution applyBatch correctly refuses to do in place), and write a
    * fresh table GENERATION at `newTableDir` with a new bucket count. The
    * cutover is a reader-side path swap (the new dir's first commit is
    * atomic); the old generation stays intact until the caller retires
    * it. Time-travel history does NOT carry (the new generation starts at
    * one commit — retention of the old dir preserves the old history);
    * the `_erased` tombstones DO carry, so the replay guard stays armed
    * across the swap.
    *
    * `castTo` maps column name → new DataType for the columns to widen;
    * unknown names are refused (a typo must not silently no-op).
    */
  def rebuildTable(spark: SparkSession, tableDir: String, newTableDir: String,
      keyCol: String, nBuckets: Int, retainCommits: Int = 2,
      castTo: Map[String, DataType] = Map.empty): Unit = {
    val t = readTable(spark, tableDir).getOrElse(throw new IllegalStateException(
      s"rebuildTable: no live commit at $tableDir"))
    val (fs, newTable) = fsFor(spark, newTableDir)
    require(!fs.exists(new HPath(newTable, "commits")),
      s"rebuildTable: $newTableDir already has a commit log — rebuilds write " +
        "a FRESH generation; pick an empty dir and swap readers after")
    val unknown = castTo.keySet -- t.columns.toSet
    require(unknown.isEmpty,
      s"rebuildTable: castTo names absent columns ${unknown.mkString(", ")}")
    val projected = t.select(t.columns.map(c =>
      castTo.get(c).map(dt => col(c).cast(dt).as(c)).getOrElse(col(c))): _*)
    // carry the tombstones BEFORE the first commit publishes: a crash in
    // between must never leave a complete-looking generation whose replay
    // guard is unarmed (a CDC replay into it would resurrect every erased
    // subject, and the fresh-generation refusal below would block the
    // natural retry from repairing it)
    ErasedKeys.read(spark, tableDir, keyCol).foreach { tomb =>
      ErasedKeys.record(spark, newTableDir, keyCol, tomb)
    }
    applyBatch(projected.withColumn("__op", lit("U")).withColumn("__seq", lit(0L)),
      0L, newTableDir, keyCol, "__op", Seq("__seq"), nBuckets = nBuckets,
      retainCommits = retainCommits, erasedGuard = false)
  }

  /** Retained commit history, oldest → newest. Depth is bounded by the
    * writer's `retainCommits` — O(retain) tiny JSON reads, never O(table).
    */
  def commitHistory(tableDir: String): Seq[Commit] = {
    val spark = SparkSession.active
    val (fs, table) = fsFor(spark, tableDir)
    val commits = listCommits(fs, table).sortBy(_._1)
      .map { case (_, p) => parseCommit(FsOps.readString(fs, p).trim) }
    if (commits.nonEmpty) commits else readLegacy(fs, table).toSeq
  }

  /** Time-travel read: the table as of commit `asOfBatch` (the highest
    * retained commit with batchId ≤ asOfBatch). None if the table has no
    * commit that old — history beyond the writer's `retainCommits` horizon
    * is pruned, so a miss means "too far back", not "empty table".
    */
  def readTableAt(spark: SparkSession, tableDir: String, asOfBatch: Long): Option[DataFrame] =
    commitHistory(tableDir).filter(_.batchId <= asOfBatch).lastOption
      .map(readCommit(spark, tableDir, _))

  private def readCommit(spark: SparkSession, tableDir: String, c: Commit): DataFrame =
    if (c.versions.nonEmpty) {
      val paths = c.versions.toSeq.sortBy(_._1)
        .map { case (b, v) => s"$tableDir/buckets/b=$b/$v" }
      // read with the COMMITTED schema, not footer inference: after a
      // schema evolution the commit references bucket versions written
      // under DIFFERENT schemas (untouched buckets keep their old files),
      // and a raw mixed read would resolve to whichever footer listed
      // first. The committed schema pins the columns; files lacking a
      // column read it as null (parquet by-name resolution).
      spark.read.schema(DataType.fromJson(c.schemaJson).asInstanceOf[StructType])
        .parquet(paths: _*)
    } else {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        DataType.fromJson(c.schemaJson).asInstanceOf[StructType])
    }

  /** Outcome of a table erasure: retained commit files whose version maps
    * were scrubbed, bucket versions rewritten (erased copy-on-write), and
    * bucket versions dropped outright (every row was a target key).
    */
  final case class EraseStats(commitsRewritten: Int, versionsRewritten: Int,
      versionsDropped: Int)

  /** GDPR erasure reaching the table's TIME-TRAVEL history (r13 verdict
    * ask #1): the commit protocol retains `retainCommits` generations of
    * bucket versions, so deleting a key via a CDC `D` record only changes
    * the LATEST state — the key's rows stay byte-present on disk and
    * servable through [[readTableAt]] for the whole retention horizon.
    * This rewrites, copy-on-write, EVERY retained bucket version holding a
    * target key ("filtering at serve time is not erasure — the bytes must
    * be gone", the [[IndexErase]] doctrine), and scrubs the retained
    * commit files in place: history ids are preserved (time travel still
    * resolves every retained commit), contents lose the erased keys.
    *
    * Protocol, crash-safe at every step (readers always resolve a complete
    * state — commit files are only ever atomically REPLACED, and a version
    * dir is deleted only after no retained commit references it):
    *  1. locate: ONE column-pruned scan of (keyCol, `_metadata.file_path`)
    *     over all retained version dirs, semi-joined against the broadcast
    *     keys → the affected (bucket, version) set. Versions without a
    *     target key are never read in full or rewritten.
    *  2. rewrite: one anti-join job stages erased copies of all affected
    *     versions (partitioned by bucket+version), promoted as NEW version
    *     dirs `<ver>.e<tag>` — invisible until a commit names them. A
    *     version erased to emptiness is dropped from the bucket map, like
    *     applyBatch's "bucket merged to empty".
    *  3. scrub: each retained commit file is atomically rewritten (same
    *     name, same batchId, same schema) with old→new version mappings.
    *  4. sweep: the replaced old version dirs — now unreferenced — are
    *     deleted. Orphaned `.e` dirs from a crashed pass are swept on the
    *     next erase (recovery), since commits never name them.
    *
    * Runs under the [[LockProvider]] seam (single maintenance writer per
    * table). A LIVE upsert stream composes: `applyBatch` does not take
    * this lock, so a batch landing mid-erase may commit version dirs that
    * still carry target keys — the stabilization loop re-lists commits
    * and re-erases until a pass finds no affected version (a stream that
    * keeps INGESTING the erased ids violates the erase-after-last-ingest
    * contract and fails loudly after 5 passes). A batch whose merge read
    * races a swept old version dir fails and replays — restart-safe, same
    * as the lake-side contract.
    */
  def eraseKeys(spark: SparkSession, tableDir: String, keyCol: String,
      keys: DataFrame, lock: LockProvider = FsLeaseLock,
      leaseMs: Long = 15L * 60 * 1000): EraseStats = {
    val (fs, table) = fsFor(spark, tableDir)
    val hconf = spark.sessionState.newHadoopConf()
    // materialize BEFORE the erase: the key frame may derive from the very
    // table being rewritten — re-planning it mid-erase would scan retired
    // version dirs. Also feeds the tombstone record below.
    val mat = keys.toDF(keyCol).distinct().persist()
    try {
    mat.count()
    val stats = lock.withLock(fs, table, leaseMs) {
      recoverErase(fs, table)
      migrateLegacyPointer(fs, hconf, table)
      val keySet = broadcast(mat)
      var commitsRewritten = 0
      var versionsRewritten = 0
      var versionsDropped = 0
      var attempts = 0
      var stable = false
      while (!stable && attempts < 5) {
        attempts += 1
        val commits = listCommits(fs, table).sortBy(_._1)
          .map { case (id, p) => (id, p, parseCommit(FsOps.readString(fs, p).trim)) }
        val versions = commits.flatMap(_._3.versions.toSeq).distinct
        def dirOf(b: Int, v: String) = s"$tableDir/buckets/b=$b/$v"
        if (versions.isEmpty) stable = true
        else {
          // 1. locate — one job, key column only, file NAMES to the driver
          val byQualDir = versions.map { case (b, v) =>
            fs.makeQualified(new HPath(dirOf(b, v))).toString -> (b, v)
          }.toMap
          // mergeSchema: retained versions may span a schema evolution —
          // footer inference from one file would drop the other files'
          // columns from the locate (harmless) and the REWRITE (data loss)
          val affected = spark.read.option("mergeSchema", "true")
            .parquet(versions.map { case (b, v) => dirOf(b, v) }: _*)
            .select(col(keyCol), col("_metadata.file_path").as("__f"))
            .join(keySet, Seq(keyCol), "left_semi")
            .select(col("__f")).distinct()
            .collect().map(r => new HPath(r.getString(0)).getParent.toString)
            .distinct.toSeq.flatMap(byQualDir.get).sorted
          if (affected.isEmpty) stable = true
          else {
            // 2. rewrite all affected versions in ONE anti-join job: the
            // stage write re-partitions by (bucket, version) so each
            // erased copy promotes independently — no per-version job loop
            val tag = java.util.UUID.randomUUID().toString.take(8)
            val stage = fs.makeQualified(new HPath(table, s".erase-stage-$tag"))
            val verRe = "/buckets/b=(\\d+)/([^/]+)/[^/]+$"
            spark.read.option("mergeSchema", "true")
              .parquet(affected.map { case (b, v) => dirOf(b, v) }: _*)
              .withColumn("__graft_b",
                regexp_extract(col("_metadata.file_path"), verRe, 1).cast("int"))
              .withColumn("__graft_ver",
                regexp_extract(col("_metadata.file_path"), verRe, 2))
              .join(keySet, Seq(keyCol), "left_anti")
              .write.mode("overwrite").partitionBy("__graft_b", "__graft_ver")
              .parquet(stage.toString)
            val renames: Map[(Int, String), Option[String]] =
              affected.map { case (b, v) =>
                val src = new HPath(stage, s"__graft_b=$b/__graft_ver=$v")
                if (fs.exists(src) &&
                    fs.listStatus(src).exists(_.getPath.getName.endsWith(".parquet"))) {
                  val nv = s"$v.e$tag"
                  val dest = new HPath(table, s"buckets/b=$b/$nv")
                  FsOps.deleteOrThrow(fs, dest, recursive = true)
                  FsOps.renameOrThrow(fs, src, dest)
                  (b, v) -> Some(nv)
                } else (b, v) -> None // erased to emptiness: drop the bucket
              }.toMap
            FsOps.deleteOrThrow(fs, stage, recursive = true)
            // 3. scrub the commit files in place (atomic replace, same
            // name/batchId/schema): history depth is untouched
            commits.foreach { case (_, p, c) =>
              if (c.versions.exists { case (b, v) => renames.contains((b, v)) }) {
                val nv = c.versions.flatMap { case (b, v) =>
                  renames.get((b, v)) match {
                    case Some(Some(n)) => Some(b -> n)
                    case Some(None)    => None
                    case None          => Some(b -> v)
                  }
                }
                FsOps.atomicWrite(hconf, fs, p,
                  renderCommit(c.copy(versions = nv)).getBytes("UTF-8"))
                commitsRewritten += 1
              }
            }
            // 4. sweep EXACTLY the replaced old dirs (never a fresh
            // promotion of an in-flight batch): after the scrub no
            // retained commit references them — verify against a fresh
            // listing before deleting, so a commit landed mid-scrub that
            // still names an old dir (pre-erase in-flight batch) keeps its
            // files until the next stabilization pass rewrites it too
            val stillRef = listCommits(fs, table)
              .map { case (_, p) => parseCommit(FsOps.readString(fs, p).trim) }
              .flatMap(_.versions.toSeq).toSet
            renames.keys.foreach { case (b, v) =>
              if (!stillRef((b, v)))
                FsOps.deleteOrThrow(fs, new HPath(table, s"buckets/b=$b/$v"),
                  recursive = true)
            }
            versionsRewritten += renames.count(_._2.isDefined)
            versionsDropped += renames.count(_._2.isEmpty)
          }
        }
      }
      if (!stable) throw new IllegalStateException(
        s"upsert-table erasure at $tableDir did not stabilize after 5 passes: " +
          "a live stream keeps committing batches that carry the target keys — " +
          "erase AFTER the ids' last ingest (pause or drain the stream), then re-run")
      EraseStats(commitsRewritten, versionsRewritten, versionsDropped)
    }
    // tombstone the erased keys ([[ErasedKeys]]): an upstream replay
    // re-delivering them is dropped by applyBatch's guard
    ErasedKeys.record(spark, tableDir, keyCol, mat)
    ErasedKeys.foldIfQuiet(spark, tableDir, keyCol, lock)
    stats
    } finally { mat.unpersist(); () }
  }

  /** Sweep leftovers of a crashed erase pass: stage dirs, and `.e`-tagged
    * version dirs no retained commit names (a crash between stage-promote
    * and commit-scrub orphans them; commits never name a version they did
    * not reference, so an unreferenced `.e` dir is always erase debris).
    */
  private def recoverErase(fs: FileSystem, table: HPath): Unit = {
    if (!fs.exists(table)) return
    fs.listStatus(table).map(_.getPath)
      .filter(_.getName.startsWith(".erase-stage-"))
      .foreach(p => FsOps.deleteOrThrow(fs, p, recursive = true))
    val referenced = listCommits(fs, table)
      .map { case (_, p) => parseCommit(FsOps.readString(fs, p).trim) }
      .flatMap(_.versions.toSeq).toSet
    val broot = new HPath(table, "buckets")
    if (fs.exists(broot))
      fs.listStatus(broot).map(_.getPath).filter(_.getName.startsWith("b=")).foreach { bdir =>
        val b = bdir.getName.stripPrefix("b=").toInt
        fs.listStatus(bdir).map(_.getPath)
          .filter(v => v.getName.contains(".e") && !referenced((b, v.getName)))
          .foreach(v => FsOps.deleteOrThrow(fs, v, recursive = true))
      }
  }

  /** Start the streaming upsert: `changes` must carry `keyCol`, `opCol`
    * (I/U/D) and `seqCols` plus the table's value columns.
    */
  def start(changes: DataFrame, tableDir: String, checkpointDir: String,
      keyCol: String, opCol: String, seqCols: Seq[String],
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
      nBuckets: Int = 16, retainCommits: Int = 2,
      erasedGuard: Boolean = true,
      erasedGuardFail: Boolean = false): StreamingQuery = {
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, tableDir, keyCol, opCol, seqCols, nBuckets,
          retainCommits = retainCommits, erasedGuard = erasedGuard,
          erasedGuardFail = erasedGuardFail)
      }
      .start()
  }

  /** The erased-key replay guard on the CDC feed itself ([[ErasedKeys]]):
    * [[eraseKeys]] tombstones the erased subjects under the table, and this
    * probe — one broadcast anti-join, zero cost when no sidecar exists —
    * drops any change row carrying a tombstoned key before the merge, with
    * a per-batch audit receipt (`_erased/dropped/batch=<id>`, idempotent by
    * overwrite). Without it an at-least-once upstream that replays a
    * crashed batch (or re-delivers history) would merge an erased subject
    * straight back into the MOST user-data-bearing store in the pipeline —
    * and into its retained time-travel history. `erasedGuardFail = true`
    * fails the batch instead of dropping (the stop-the-line posture);
    * `erasedGuard = false` opts out entirely. A GENUINE re-ingest of an
    * erased key is indistinguishable from a replay and is dropped too until
    * the tombstone is deliberately cleared ([[ErasedKeys.clear]]).
    */
  private def guardErased(batch: DataFrame, batchId: Long, tableDir: String,
      keyCol: String, opCol: String, seqCols: Seq[String],
      failOnHit: Boolean): DataFrame =
    ErasedKeys.guardWithReceipt(batch, tableDir, keyCol,
      keyCol +: opCol +: seqCols, batchId, failOnHit, "upsert")

  private[graft] def applyBatch(batch0: DataFrame, batchId: Long, tableDir: String,
      keyCol: String, opCol: String, seqCols: Seq[String], nBuckets: Int = 16,
      crashBeforeCommit: Boolean = false, retainCommits: Int = 2,
      erasedGuard: Boolean = true, erasedGuardFail: Boolean = false): Unit = {
    val spark = batch0.sparkSession
    val (fs, table) = fsFor(spark, tableDir)
    val hconf = spark.sessionState.newHadoopConf()
    fs.mkdirs(commitsDir(table))

    // Replay idempotence: the commit carries the batch id that produced it.
    // A crash between commit and checkpoint advance replays the SAME batch
    // id — skip it. A commit AHEAD of the incoming batch id means a fresh
    // checkpoint is replaying history into an already-advanced table — fail
    // fast rather than corrupt it (reprocess into a fresh tableDir).
    migrateLegacyPointer(fs, hconf, table)
    val current = readLatest(fs, table).map(parseCommit)
    if (current.exists(_.batchId == batchId)) return
    if (current.exists(_.batchId > batchId))
      throw new IllegalStateException(
        s"UpsertSink at $tableDir is at batch ${current.get.batchId} but received " +
          s"replayed batch $batchId from an older/reset checkpoint; reprocessing into " +
          "an existing table is not supported — use a fresh tableDir (and checkpoint) to rebuild")
    // No commit but bucket data from some OTHER batch exists ⇒ the commit
    // log was lost (not a first-batch crash, whose orphan versions would
    // carry THIS batch id). Merging against an empty target would silently
    // truncate the table — refuse.
    if (current.isEmpty) {
      val broot = new HPath(table, "buckets")
      if (fs.exists(broot)) {
        val foreign = fs.listStatus(broot).map(_.getPath).filter(_.getName.startsWith("b="))
          .flatMap(b => fs.listStatus(b).map(_.getPath.getName))
          .filter(v => v.startsWith("v-") && v != f"v-$batchId%010d")
        if (foreign.nonEmpty)
          throw new IllegalStateException(
            s"UpsertSink at $tableDir has bucket data (${foreign.head}…) but no commit " +
              "log — refusing to merge against an empty target (this would truncate the " +
              "table); restore commits/ or rebuild into a fresh tableDir")
      }
    }
    // erased-key replay guard (after the replay short-circuit — a skipped
    // batch needs no probe; before the merge — a tombstoned key must not
    // reach the table or its retained history)
    val batch =
      if (erasedGuard)
        guardErased(batch0, batchId, tableDir, keyCol, opCol, seqCols,
          erasedGuardFail)
      else batch0
    // bucket count is pinned by the first commit — a config change must not
    // silently re-key the layout
    val nb = current.map(_.nBuckets).getOrElse(nBuckets)
    // the per-batch touched-bucket collect and the commit's version map are
    // both O(nb) DRIVER state — enforce the documented bound instead of
    // letting a runaway config turn them into a driver OOM (1M buckets is
    // already far past the useful range: buckets exist to bound rewrite
    // amplification, not to shard rows one-per-file)
    require(nb > 0 && nb <= (1 << 20),
      s"nBuckets=$nb out of range (1..${1 << 20}): the bucket map and " +
        "touched-bucket set are driver-side state sized O(nBuckets)")
    val bucketOf = pmod(hash(col(keyCol)), lit(nb))

    // 1. touched buckets: the batch's keys hash into a bounded set (≤ nb ints
    //    to the driver — this collect is O(buckets), never O(rows))
    val touched = batch.select(bucketOf.as("__b")).distinct()
      .collect().map(_.getInt(0)).toSet

    // 2. merge ONLY the touched buckets' live state with the batch — rows of
    //    untouched buckets cannot contain batch keys (bucket is a pure key
    //    function), so they need no read and no rewrite. Touched buckets
    //    read under the COMMITTED schema (their versions may predate an
    //    evolution; see readCommit).
    val batchCols = batch.columns.filterNot(c => c == opCol || seqCols.contains(c))
    val batchSchema = batch.select(batchCols.map(col): _*).schema
    val committedSchema = current.map(c =>
      DataType.fromJson(c.schemaJson).asInstanceOf[StructType])
    // SCHEMA EVOLUTION (add/remove column — the CDC reality): a change
    // feed that GROWS a column must not silently lose it (the merge
    // projects to the table's columns), and one that DROPS a column must
    // not fail the sink. Both sides align by name below, missing columns
    // typed null. A TYPE change is refused loudly: widening in place
    // would leave untouched buckets un-widened (a mixed-type table no
    // read can resolve) — that is a table rebuild (see nBucketsFor's
    // resize path), not a silent cast.
    committedSchema.foreach { ts =>
      val conflicts = ts.filter(f => batchSchema.fields.exists(b =>
        b.name == f.name && b.dataType != f.dataType))
      if (conflicts.nonEmpty)
        throw new IllegalStateException(
          s"UpsertSink at $tableDir: batch $batchId changes the TYPE of " +
            conflicts.map(f => s"'${f.name}' (${f.dataType.simpleString} -> " +
              s"${batchSchema(f.name).dataType.simpleString})").mkString(", ") +
            " — in-place type widening would leave untouched buckets " +
            "un-widened; rebuild a fresh generation with " +
            "UpsertSink.rebuildTable(castTo = ...), then swap tableDirs")
    }
    val targetPaths = current.toSeq.flatMap(_.versions.toSeq)
      .collect { case (b, v) if touched(b) => s"$tableDir/buckets/b=$b/$v" }
    val target =
      if (targetPaths.nonEmpty)
        spark.read.schema(committedSchema.get).parquet(targetPaths: _*)
      else committedSchema match {
        case Some(ts) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ts)
        case None => batch.select(batchCols.map(col): _*).limit(0)
      }
    val tableCols =
      (target.columns ++ batchCols.filterNot(target.columns.contains)).toSeq
    val colTypes = (committedSchema.map(_.fields).getOrElse(Array.empty) ++
      batchSchema.fields).map(f => f.name -> f.dataType).toMap
    def aligned(df: DataFrame, extra: Seq[String]) =
      df.select(tableCols.map(c =>
        if (df.columns.contains(c)) col(c)
        else lit(null).cast(colTypes(c)).as(c)) ++ extra.map(col): _*)
    val merged = Upsert.applyChanges(aligned(target, Nil),
      aligned(batch, opCol +: seqCols), keyCol, opCol, seqCols: _*)

    val ver = f"v-$batchId%010d"
    // 3. write the touched buckets' new versions via a batch-scoped stage
    //    (PUT #1 — invisible until committed); overwrite discards a crashed
    //    attempt's stage
    val stage = fs.makeQualified(new HPath(table, f".stage-$batchId%010d"))
    merged.withColumn("__bucket", bucketOf)
      .write.mode("overwrite").partitionBy("__bucket").parquet(stage.toString)
    val newVersions = touched.toSeq.sorted.flatMap { b =>
      val src = new HPath(stage, s"__bucket=$b")
      val dest = new HPath(table, s"buckets/b=$b/$ver")
      FsOps.deleteOrThrow(fs, dest, recursive = true) // crashed attempt of THIS batch
      if (fs.exists(src)) {
        fs.mkdirs(dest.getParent)
        FsOps.renameOrThrow(fs, src, dest)
        Some(b -> ver)
      } else None // bucket merged to empty (all its keys deleted)
    }.toMap
    FsOps.deleteOrThrow(fs, stage, recursive = true)

    if (crashBeforeCommit) // test-only failpoint: die with versions promoted
      throw new RuntimeException("injected crash before commit")

    // 4. the commit (PUT #2): temp + rename to a NEW commit file name — the
    //    previous commit stays live until this one exists, so readers always
    //    resolve a complete state. Untouched buckets REBASE on a fresh read
    //    of the latest commit: a concurrent eraseKeys scrubs commit files
    //    (same batchId, rewritten version names) and then sweeps the old
    //    version dirs — publishing the version map we merged against, read
    //    before the whole merge job, would re-reference just-deleted dirs.
    //    The fresh map is correct for buckets this batch did not touch (the
    //    erased copy IS their current content); touched buckets carry this
    //    batch's own merge result, and an erase racing THAT is converged by
    //    eraseKeys' stabilization loop.
    val base = readLatest(fs, table).map(parseCommit)
      .filter(c => current.exists(_.batchId == c.batchId))
      .map(_.versions).orElse(current.map(_.versions)).getOrElse(Map.empty)
    val commit = Commit(batchId, nb, base -- touched ++ newVersions,
      merged.select(tableCols.map(col): _*).schema.json)
    FsOps.atomicWrite(hconf, fs, new HPath(commitsDir(table), commitName(batchId)),
      renderCommit(commit).getBytes("UTF-8"))

    // 5. prune to the retention horizon: keep the newest `retainCommits`
    //    commit files (≥ 2 — the immediately previous one shields in-flight
    //    readers; more buys time-travel depth for readTableAt), then drop
    //    any touched bucket version no retained commit references. Version
    //    reachability comes from the RETAINED commit set, so a reader
    //    resolving any surviving commit always finds its files.
    val retain = math.max(2, retainCommits)
    val stale = listCommits(fs, table).map(_._1).filter(_ < batchId)
      .sorted.dropRight(retain - 1)
    stale.foreach(id =>
      FsOps.deleteOrThrow(fs, new HPath(commitsDir(table), commitName(id)), recursive = false))
    val retained = listCommits(fs, table)
      .map { case (_, p) => parseCommit(FsOps.readString(fs, p).trim) }
    touched.foreach { b =>
      val keep = retained.flatMap(_.versions.get(b)).toSet + ver
      val bdir = new HPath(table, s"buckets/b=$b")
      if (fs.exists(bdir))
        fs.listStatus(bdir).map(_.getPath)
          .filter(p => p.getName.startsWith("v-") && !keep(p.getName))
          .foreach(p => FsOps.deleteOrThrow(fs, p, recursive = true))
    }
  }
}
