package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DataType, StructType}
import graft.operators.Upsert

/** Streaming CDC upsert sink (K7/K8 streaming form): maintain a keyed table
  * under `tableDir`, applying each micro-batch of changes with the staged
  * merge (`Upsert.applyChanges`) and publishing via atomic pointer swap —
  * the "zero-downtime upsert" contract (README.md:571-575): readers see
  * either the previous commit or the new one, never a partial state.
  *
  * Scale design: the table is hash-bucketed by key
  * (`buckets/b=<i>/v-<batchId>` version dirs). A batch's keys deterministically
  * land in a bounded set of buckets, so each micro-batch reads, merges and
  * rewrites ONLY the touched buckets — O(batch ∪ touched-buckets) I/O, not
  * O(table) — then atomically rewrites the `current` pointer (a JSON map of
  * bucket → live version). Untouched buckets' files are not opened, moved,
  * or rewritten. Old versions of touched buckets are pruned keeping the
  * immediately previous one for in-flight readers.
  *
  * All pointer/promotion I/O goes through Hadoop FileSystem, so remote
  * tableDir URIs (hdfs://, s3a://) resolve against the right store.
  */
object UpsertSink {

  /** A published table state: the batch that committed it, the bucket count
    * it was written with, and the live version dir per non-empty bucket.
    */
  final case class Commit(batchId: Long, nBuckets: Int, versions: Map[Int, String])

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def readPointer(fs: FileSystem, table: HPath): Option[String] = {
    val p = new HPath(table, "current")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  private def parseCommit(json: String): Commit = {
    val batch = """"batch"\s*:\s*(\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    val nb = """"nbuckets"\s*:\s*(\d+)""".r.findFirstMatchIn(json).get.group(1).toInt
    val vs = """"(\d+)"\s*:\s*"(v-\d+)"""".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
    Commit(batch, nb, vs)
  }

  private def renderCommit(c: Commit): String = {
    val vs = c.versions.toSeq.sortBy(_._1)
      .map { case (b, v) => s""""$b": "$v"""" }.mkString("{", ", ", "}")
    s"""{"batch": ${c.batchId}, "nbuckets": ${c.nBuckets}, "versions": $vs}"""
  }

  /** Raw pointer contents — an opaque commit token (changes iff the table
    * state changed; stable across replays of the same batch).
    */
  def currentSnapshot(tableDir: String): Option[String] = {
    val spark = SparkSession.active
    val (fs, table) = fsFor(spark, tableDir)
    readPointer(fs, table)
  }

  /** The parsed live commit, if the table has one. */
  def currentCommit(tableDir: String): Option[Commit] = {
    val spark = SparkSession.active
    val (fs, table) = fsFor(spark, tableDir)
    readPointer(fs, table).map(parseCommit)
  }

  /** Read the live table state: the union of each bucket's live version.
    * An existing but all-buckets-empty table reads as an empty frame with
    * the persisted schema.
    */
  def readTable(spark: SparkSession, tableDir: String): Option[DataFrame] =
    currentCommit(tableDir).map { c =>
      if (c.versions.nonEmpty) {
        val paths = c.versions.toSeq.sortBy(_._1)
          .map { case (b, v) => s"$tableDir/buckets/b=$b/$v" }
        spark.read.parquet(paths: _*)
      } else {
        val (fs, table) = fsFor(spark, tableDir)
        val in = fs.open(new HPath(table, "_schema.json"))
        val ddl = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          DataType.fromJson(ddl).asInstanceOf[StructType])
      }
    }

  /** Start the streaming upsert: `changes` must carry `keyCol`, `opCol`
    * (I/U/D) and `seqCols` plus the table's value columns.
    */
  def start(changes: DataFrame, tableDir: String, checkpointDir: String,
      keyCol: String, opCol: String, seqCols: Seq[String],
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
      nBuckets: Int = 16): StreamingQuery = {
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, tableDir, keyCol, opCol, seqCols, nBuckets)
      }
      .start()
  }

  private[streaming] def applyBatch(batch: DataFrame, batchId: Long, tableDir: String,
      keyCol: String, opCol: String, seqCols: Seq[String], nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val (fs, table) = fsFor(spark, tableDir)
    fs.mkdirs(table)

    // Replay idempotence: the pointer carries the batch id that produced it.
    // A crash between pointer swap and checkpoint commit replays the SAME
    // batch id — skip it. A pointer AHEAD of the incoming batch id means a
    // fresh checkpoint is replaying history into an already-advanced table —
    // fail fast rather than corrupt it (reprocess into a fresh tableDir).
    val current = readPointer(fs, table).map(parseCommit)
    if (current.exists(_.batchId == batchId)) return
    if (current.exists(_.batchId > batchId))
      throw new IllegalStateException(
        s"UpsertSink at $tableDir is at batch ${current.get.batchId} but received " +
          s"replayed batch $batchId from an older/reset checkpoint; reprocessing into " +
          "an existing table is not supported — use a fresh tableDir (and checkpoint) to rebuild")
    // bucket count is pinned by the first commit — a config change must not
    // silently re-key the layout
    val nb = current.map(_.nBuckets).getOrElse(nBuckets)
    val bucketOf = pmod(hash(col(keyCol)), lit(nb))

    // 1. touched buckets: the batch's keys hash into a bounded set (≤ nb ints
    //    to the driver — this collect is O(buckets), never O(rows))
    val touched = batch.select(bucketOf.as("__b")).distinct()
      .collect().map(_.getInt(0)).toSet

    // 2. merge ONLY the touched buckets' live state with the batch — rows of
    //    untouched buckets cannot contain batch keys (bucket is a pure key
    //    function), so they need no read and no rewrite
    val tableCols = batch.columns.filterNot(c => c == opCol || seqCols.contains(c))
    val targetPaths = current.toSeq.flatMap(_.versions.toSeq)
      .collect { case (b, v) if touched(b) => s"$tableDir/buckets/b=$b/$v" }
    val target =
      if (targetPaths.nonEmpty) spark.read.parquet(targetPaths: _*)
      else batch.select(tableCols.map(col): _*).limit(0)
    val merged = Upsert.applyChanges(target, batch, keyCol, opCol, seqCols: _*)

    val ver = f"v-$batchId%010d"
    // 3. write the touched buckets' new versions via a batch-scoped stage
    //    (PUT #1 — invisible until pointed to); overwrite discards a crashed
    //    attempt's stage
    val stage = fs.makeQualified(new HPath(table, f".stage-$batchId%010d"))
    merged.withColumn("__bucket", bucketOf)
      .write.mode("overwrite").partitionBy("__bucket").parquet(stage.toString)
    val newVersions = touched.toSeq.sorted.flatMap { b =>
      val src = new HPath(stage, s"__bucket=$b")
      val dest = new HPath(table, s"buckets/b=$b/$ver")
      if (fs.exists(dest)) fs.delete(dest, true) // crashed attempt of THIS batch
      if (fs.exists(src)) {
        fs.mkdirs(dest.getParent)
        fs.rename(src, dest)
        Some(b -> ver)
      } else None // bucket merged to empty (all its keys deleted)
    }.toMap
    fs.delete(stage, true)

    // 4. persist the schema (for empty-table reads) then atomically repoint
    //    (PUT #2 — the commit)
    val schemaTmp = new HPath(table, "._schema.json.tmp")
    val so = fs.create(schemaTmp, true)
    so.write(merged.select(tableCols.map(col): _*).schema.json.getBytes("UTF-8"))
    so.close()
    fs.delete(new HPath(table, "_schema.json"), false)
    fs.rename(schemaTmp, new HPath(table, "_schema.json"))

    val commit = Commit(batchId, nb,
      current.map(_.versions).getOrElse(Map.empty) -- touched ++ newVersions)
    val tmp = new HPath(table, s".current-$batchId.tmp")
    val out = fs.create(tmp, true)
    out.write(renderCommit(commit).getBytes("UTF-8"))
    out.close()
    fs.delete(new HPath(table, "current"), false)
    fs.rename(tmp, new HPath(table, "current"))

    // 5. prune touched buckets' stale versions, keeping the immediately
    //    previous one for in-flight readers
    touched.foreach { b =>
      val keep = Set(ver) ++ current.flatMap(_.versions.get(b))
      val bdir = new HPath(table, s"buckets/b=$b")
      if (fs.exists(bdir))
        fs.listStatus(bdir).map(_.getPath)
          .filter(p => p.getName.startsWith("v-") && !keep(p.getName))
          .foreach(p => fs.delete(p, true))
    }
  }
}
