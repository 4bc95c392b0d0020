package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming corpus-index dedup: the continuously-fed-corpus form of
  * [[graft.operators.Dedup.incrementalExact]]. Each incoming micro-batch of
  * documents is classified against an ACCUMULATING fingerprint index —
  * `known_dup` (fingerprint already in the corpus or any earlier batch),
  * `batch_dup` (a smaller doc_id in the same batch has the fingerprint),
  * `new` — then the batch's previously-unseen fingerprints are appended to
  * the index, so later batches dedup against everything that came before.
  * Re-deduplicating a 100 TB lake per incoming batch is not an option; this
  * keeps per-batch cost O(batch + index probe).
  *
  * Exactly-once without a transactional store: every batch writes its
  * verdicts to `verdicts/batch=<id>/` and its index delta to
  * `index/delta=<id>/`, each with OVERWRITE semantics — a crash-replayed
  * batch (foreachBatch is at-least-once) rewrites the SAME directories with
  * the SAME deterministic content instead of double-appending. The index
  * read is a plain partitioned-parquet scan of all deltas; the delta for
  * the replayed batch is excluded from its own probe (a half-written delta
  * from the crashed attempt must not make the batch classify itself as
  * already-known).
  *
  * Scale shape: the index carries fingerprints ONLY (16 bytes/doc — a
  * 100 TB corpus's index is a few hundred GB of parquet, itself
  * partition-pruned by delta). The probe join shuffles fingerprints, never
  * documents, and a small batch broadcasts against the index side.
  */
object CorpusIndex {

  val IndexSchema: StructType = StructType(Seq(StructField("fp", StringType)))

  /** Seed the index from an existing corpus (delta = -1, before any batch). */
  def seed(docs: DataFrame, idCol: String, textCol: String, indexDir: String): Unit =
    docs.select(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .distinct()
      .write.mode("overwrite").parquet(s"$indexDir/delta=-1")

  /** All index fingerprints from deltas EXCLUDING `excludeDelta` (a batch
    * must not probe its own possibly-half-written delta on replay).
    * Missing/empty index reads as empty.
    */
  def readIndex(spark: SparkSession, indexDir: String, excludeDelta: Long): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(indexDir)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], IndexSchema)
    spark.read.schema(StructType(IndexSchema.fields :+
        StructField("delta", LongType))).parquet(indexDir)
      .where(col("delta") =!= excludeDelta)
      .select(col("fp"))
  }

  val BandsSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("band", org.apache.spark.sql.types.IntegerType),
    StructField("band_sig", StringType)))
  val ArraysSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sh", org.apache.spark.sql.types.ArrayType(StringType))))

  /** Shared delta reader (also used by [[EmbeddingIndex]]): all deltas
    * except the in-flight batch's own (replay idempotence — a replayed
    * batch must not probe the half-written delta it is about to replace).
    */
  private[streaming] def readDeltas(spark: SparkSession, dir: String, schema: StructType,
      excludeDelta: Long): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    spark.read.schema(StructType(schema.fields :+ StructField("delta", LongType)))
      .parquet(dir)
      .where(col("delta") =!= excludeDelta)
      .select(schema.fieldNames.map(col): _*)
  }

  /** Fold an accumulating delta-dir index (one subdir per batch) back into
    * a single base delta — the maintenance pass a long-running index
    * stream needs (every batch adds a directory; a year of 60 s batches is
    * ~500k dirs of listing cost per probe). Crash-safe by WRITE ORDER
    * alone: the merged base is written to a STAGING dir, promoted under a
    * FRESH negative delta id, and only then are the folded deltas removed —
    * a crash at any point leaves every row visible at least once, and the
    * consumers are duplicate-tolerant (fingerprint probes are semi-joins;
    * band/array candidates and verified pairs go through distinct()).
    * The NEWEST batch delta is never folded, so compaction is safe to run
    * at any moment — including between a crashed batch and its replay,
    * whose excludeDelta protection depends on that delta staying where
    * the replay expects it.
    */
  private[graft] def compactDeltas(spark: SparkSession, dir: String,
      schema: StructType): Int = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) return 0
    val deltas = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath).filter(_.getName.startsWith("delta="))
    // NEVER fold the newest batch delta: if the stream crashed after that
    // batch's delta landed but before its checkpoint committed, the
    // restart REPLAYS that batch id and relies on excludeDelta to not
    // probe its own half-state — folding it into a negative base (which
    // no probe ever excludes) would misclassify the whole replayed batch
    // as already-known. Everything older is safe: earlier batches'
    // checkpoints are committed and can never replay.
    val newestBatch = deltas.map(_.getName.stripPrefix("delta=").toLong)
      .filter(_ >= 0).maxOption
    val fold = deltas.filterNot(d =>
      newestBatch.contains(d.getName.stripPrefix("delta=").toLong))
    if (fold.size <= 1) return 0
    // the new base gets a FRESH negative delta id (below every existing
    // one): batch ids are ≥ 0, so a negative delta is never excluded from
    // a probe, and promoting BEFORE deleting the olds means no instant
    // where a row lives only in the hidden stage — the crash window is
    // "old ∪ new visible" (duplicates, which every consumer tolerates and
    // the next compaction's distinct() folds away)
    val newBase = deltas.map(_.getName.stripPrefix("delta=").toLong).min - 1
    val stage = new org.apache.hadoop.fs.Path(dir, ".compact-stage")
    spark.read.schema(schema).parquet(fold.map(_.toString): _*)
      .distinct()
      .write.mode("overwrite").parquet(stage.toString)
    FsOps.renameOrThrow(fs, stage, new org.apache.hadoop.fs.Path(dir, s"delta=$newBase"))
    fold.foreach(d => FsOps.deleteOrThrow(fs, d, recursive = true))
    fold.size
  }

  /** Fold the exact-dedup fingerprint index's deltas into one base. */
  def compact(spark: SparkSession, indexDir: String): Int =
    compactDeltas(spark, indexDir, IndexSchema)

  /** Fold the NEAR-dup index's band and array deltas into one base each. */
  def compactNear(spark: SparkSession, indexDir: String): Int =
    compactDeltas(spark, s"$indexDir/bands", BandsSchema) +
      compactDeltas(spark, s"$indexDir/arrays", ArraysSchema)

  /** Seed the NEAR-dup index (LSH bands + shingle arrays) from an existing
    * corpus, as delta = -1. The MinHash geometry (k, rowsPerBand) is
    * persisted as a one-row `_geometry` parquet under the index: every
    * delta's band signatures must come from the SAME k and banding or
    * probes never collide with the index ([[startNear]] enforces it — the
    * [[EmbeddingIndex]] / PqIndex silent-recall-loss discipline).
    */
  def seedNear(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      k: Int = 16, rowsPerBand: Int = 2): Unit = {
    // refuse to re-seed over accumulated streaming deltas (the
    // EmbeddingIndex rule): seed overwrites only delta=-1 and the geometry
    // row, so a geometry change would leave deltas >= 0 banded under the
    // old MinHash while the new row certifies consistency
    val bandsRoot = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
    val fs = bandsRoot.getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(bandsRoot)) {
      val streamed = fs.listStatus(bandsRoot).map(_.getPath.getName)
        .filter(n => n.startsWith("delta=") && n != "delta=-1")
      require(streamed.isEmpty,
        s"near-dup index at $indexDir already has ${streamed.length} streaming " +
          s"delta(s): re-seeding would change the MinHash geometry under them " +
          "and probes would silently skip the streamed docs — rebuild into a " +
          "fresh indexDir")
    }
    // RE-seed: drop the old seed deltas BEFORE certifying the new geometry
    // (the EmbeddingIndex.seed rule) — a crash between the geometry write
    // and the data overwrite must never leave OLD-MinHash bands under a
    // NEW-geometry certificate
    Seq(s"$indexDir/bands/delta=-1", s"$indexDir/arrays/delta=-1").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (fs.exists(p)) FsOps.deleteOrThrow(fs, p, recursive = true)
    }
    // geometry BEFORE data (the EmbeddingIndex.seed ordering): a crash
    // between the writes must leave _geometry already certifying the
    // MinHash the data was (about to be) banded under, never banded data
    // whose geometry a later startNear() would be invited to guess
    writeNearGeometry(docs.sparkSession, indexDir, k, rowsPerBand)
    val arrays = Dedup.shingleArrays(docs, idCol, textCol, n = 3)
    arrays.write.mode("overwrite").parquet(s"$indexDir/arrays/delta=-1")
    Dedup.minhashBandsNarrow(arrays, k, rowsPerBand)
      .write.mode("overwrite").parquet(s"$indexDir/bands/delta=-1")
    // re-verify AFTER writing: the pre-check is unlocked, so a LIVE
    // startNear() stream can commit a delta mid-seed — banded under the
    // old MinHash while the fresh _geometry certifies the new one. Fail
    // loudly instead of leaving a mixed-geometry index running green.
    // (Operationally: stop the stream before re-seeding.)
    if (fs.exists(bandsRoot)) {
      val raced = fs.listStatus(bandsRoot).map(_.getPath.getName)
        .filter(n => n.startsWith("delta=") && n != "delta=-1")
      require(raced.isEmpty,
        s"near-dup index at $indexDir gained ${raced.length} streaming " +
          s"delta(s) (${raced.take(3).mkString(", ")}) WHILE seedNear() was " +
          "writing — a live startNear() stream raced the re-seed and those " +
          "deltas are banded under a different MinHash than the new " +
          "_geometry certifies. Stop the stream before re-seeding; rebuild " +
          "this index into a fresh indexDir")
    }
  }

  private def writeNearGeometry(spark: SparkSession, indexDir: String,
      k: Int, rowsPerBand: Int): Unit =
    spark.createDataFrame(Seq((k, rowsPerBand)))
      .toDF("k", "rows_per_band")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_geometry")

  /** The near-dup index's persisted MinHash geometry, if it carries one
    * (indexes seeded before the `_geometry` row do not — their callers
    * must keep passing the original parameters).
    */
  def readNearGeometry(spark: SparkSession,
      indexDir: String): Option[(Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/_geometry")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(s"$indexDir/_geometry").head()
      Some((r.getAs[Int]("k"), r.getAs[Int]("rows_per_band")))
    }
  }

  /** Streaming NEAR-dup detection against an accumulating LSH index — the
    * streaming form of [[Dedup.incrementalNearDups]]. Each batch's docs are
    * banded map-side ([[Dedup.minhashBandsNarrow]] — zero signature-stage
    * exchanges), probed against every earlier delta's bands (plus the batch
    * against itself, smaller id wins), Jaccard-verified over shingle
    * arrays, and the batch's own bands/arrays are appended as idempotent
    * per-batch deltas — same overwrite-by-batchId replay contract as
    * [[start]], self-delta excluded from the probe.
    *
    * Index volume: bands are k/rowsPerBand 32-byte rows per doc; shingle
    * arrays dominate (≈ doc token count × ~3 words each). A production
    * variant can re-derive arrays from stored text at verify time and keep
    * only bands indexed; both sides of that trade are one config away
    * (the verify join takes any (id, sh) frame).
    * Output: `outDir/batch=<id>/` rows (id_new, id_other, jaccard ≥
    * threshold) with id_other from the corpus, earlier batches, or a
    * smaller same-batch id.
    */
  /** `adoptGeometry`: a pre-geometry index (seeded before the `_geometry`
    * row existed) already holds banded deltas whose MinHash parameters this
    * call cannot verify — certifying the caller's (k, rowsPerBand) over
    * them is refused by default (the [[EmbeddingIndex.start]] rule: a wrong
    * guess enshrined makes probes miss all pre-existing docs and points
    * future mismatch errors the wrong way). Pass true only when the
    * parameters are known to be the index's original ones.
    */
  def startNear(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      k: Int = 16, rowsPerBand: Int = 2, threshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow(),
      adoptGeometry: Boolean = false): StreamingQuery = {
    // band signatures from a different k/banding never match the index's —
    // the stream would run green while detecting nothing. Refuse a
    // geometry mismatch up front; an index CREATED by streaming (no seed)
    // persists its geometry on first start, so a later restart under
    // different parameters is refused too.
    readNearGeometry(docs.sparkSession, indexDir) match {
      case Some((gk, gr)) =>
        require(gk == k && gr == rowsPerBand,
          s"near-dup index at $indexDir carries geometry (k=$gk, " +
            s"rowsPerBand=$gr) but startNear() was given (k=$k, " +
            s"rowsPerBand=$rowsPerBand) — probes under a different MinHash " +
            "geometry silently miss every indexed doc; pass the carried " +
            "values or rebuild the index")
      case None =>
        // bands already on disk but no _geometry: their MinHash is unknown
        // to this call — adopting the caller's (k, rowsPerBand) unverified
        // converts a silently-wrong probe into an ENFORCED-wrong one.
        // Refuse unless the caller explicitly vouches for the parameters.
        val bandsRoot = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
        val fs = bandsRoot.getFileSystem(
          docs.sparkSession.sparkContext.hadoopConfiguration)
        val existing =
          if (!fs.exists(bandsRoot)) Array.empty[String]
          else fs.listStatus(bandsRoot).map(_.getPath.getName)
            .filter(_.startsWith("delta="))
        require(existing.isEmpty || adoptGeometry,
          s"near-dup index at $indexDir holds ${existing.length} band delta " +
            s"dir(s) (${existing.take(3).mkString(", ")}) but no _geometry " +
            s"row — adopting (k=$k, rowsPerBand=$rowsPerBand) as the certified " +
            "MinHash geometry is refused: if they differ from the original " +
            "seed's, probes silently miss every indexed doc. Pass " +
            "adoptGeometry = true only if these ARE the original parameters, " +
            "or rebuild the index with seedNear()")
        if (existing.nonEmpty)
          System.err.println(s"[graft] WARNING: adopting caller-supplied " +
            s"MinHash geometry (k=$k, rowsPerBand=$rowsPerBand) for " +
            s"pre-geometry near-dup index $indexDir with ${existing.length} " +
            "existing delta(s) — certified correct only if these match the " +
            "original seed")
        writeNearGeometry(docs.sparkSession, indexDir, k, rowsPerBand)
    }
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        // erased-id replay guard at batch entry: a tombstoned id (erased
        // via IndexErase.eraseFromNearIndex) is dropped BEFORE banding, so
        // neither the output pairs nor the index deltas resurrect it
        val batch = ErasedKeys.dropErased(batch0, indexDir, "id", idCol,
          "CorpusIndex near-dup append")
        // arrays/bands each feed the probe AND a delta write — persist so
        // the tokenize + shingle + 16-perm minhash map side runs once per
        // batch, not once per consumer
        val arrays = Dedup.shingleArrays(batch, idCol, textCol, n = 3).persist()
        val bands = Dedup.minhashBandsNarrow(arrays, k, rowsPerBand).persist()
        try {
          val corpusBands = readDeltas(spark, s"$indexDir/bands", BandsSchema, batchId)
          val corpusArrays = readDeltas(spark, s"$indexDir/arrays", ArraysSchema, batchId)
          Dedup.incrementalNearDups(bands, arrays, corpusBands, corpusArrays, threshold)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          bands.write.mode("overwrite").parquet(s"$indexDir/bands/delta=$batchId")
          arrays.write.mode("overwrite").parquet(s"$indexDir/arrays/delta=$batchId")
        } finally { bands.unpersist(); arrays.unpersist(); () }
      }
      .start()
  }

  /** Start the streaming dedup. `docs` is a streaming DataFrame with
    * (idCol: long, textCol: string). Verdicts land in
    * `verdictDir/batch=<id>/` as (doc_id, fp, verdict).
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, verdictDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val corpusFps = readIndex(spark, indexDir, excludeDelta = batchId)
        val verdicts = Dedup.incrementalExact(batch, idCol, textCol, corpusFps)
          .withColumnRenamed("id", idCol)
        verdicts.write.mode("overwrite").parquet(s"$verdictDir/batch=$batchId")
        // append the batch's previously-unseen fingerprints: 'new' docs and
        // the KEEPER of each batch_dup group (smallest id) — i.e. one row
        // per distinct fingerprint not already in the index. Fingerprints
        // tombstoned by IndexErase.eraseFingerprints are DROPPED (the
        // erased-key replay guard): a crash-replayed batch carrying an
        // erased doc must not silently re-index it.
        ErasedKeys.dropErased(
          spark.read.parquet(s"$verdictDir/batch=$batchId")
            .where(col("verdict") =!= "known_dup")
            .select(col("fp")).distinct(),
          indexDir, "fp", "fp", "CorpusIndex delta append")
          .write.mode("overwrite").parquet(s"$indexDir/delta=$batchId")
        ()
      }
      .start()
}
