package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** Streaming embedding near-duplicate detection against an ACCUMULATING
  * sign-LSH index — the vector counterpart of [[CorpusIndex.startNear]]:
  * each micro-batch of embeddings is bucketed map-side
  * ([[Dedup.embeddingBuckets]] — deterministic seeded hyperplanes, no
  * model state to version), probed against every earlier delta's buckets
  * (and against itself, smaller id wins), cosine-verified, and appended as
  * an idempotent per-batch delta (overwrite-by-batchId — replays never
  * double-append; the self-delta is excluded from the probe).
  *
  * Scale shape: the index stores (id, vector, norm, bucket) rows — the
  * join key is the (table, bucket) pair, so a batch compares against
  * O(batch × bucket-collisions), never O(index). Index volume is
  * nTables× the corpus vectors; at 100 TB-corpus scale, partition the
  * delta dirs by bucket prefix so a probe's shuffle reads only colliding
  * buckets.
  */
object EmbeddingIndex {

  def bucketSchema(dim: Int): StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("e", ArrayType(DoubleType)),
    StructField("nrm", DoubleType),
    StructField("tb", StructType(Seq(
      StructField("t", IntegerType), StructField("b", IntegerType))))))

  /** Seed the index from an existing corpus, as delta = -1.
    *
    * `bitsPerTable = 0` auto-sizes buckets to the SEED corpus via
    * [[Dedup.bitsPerTableFor]]. Whatever geometry is chosen is persisted
    * as a one-row `_geometry` parquet under the index (the underscore
    * prefix keeps it invisible to the delta partition-discovery read):
    * every row of every delta must be bucketed by the SAME hyperplanes,
    * or probes silently miss — the geometry rides with the index so
    * [[start]] can enforce that instead of trusting the caller to repeat
    * the right parameters forever.
    */
  def seed(emb: DataFrame, idCol: String, embCol: String, dim: Int,
      indexDir: String, nTables: Int = 12, bitsPerTable: Int = 4): Unit = {
    // refuse to re-seed over accumulated streaming deltas: seed overwrites
    // only delta=-1 and the geometry row, so a geometry change here would
    // leave deltas >= 0 bucketed under the OLD hyperplanes while the new
    // row certifies the index as consistent — a mixed-geometry index whose
    // probes silently skip the streamed portion. Rebuild into a fresh
    // indexDir instead (or delete the deltas deliberately first).
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(emb.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      val streamed = fs.listStatus(root).map(_.getPath.getName)
        .filter(n => n.startsWith("delta=") && n != "delta=-1")
      require(streamed.isEmpty,
        s"index at $indexDir already has ${streamed.length} streaming " +
          s"delta(s) (${streamed.take(3).mkString(", ")}…): re-seeding would " +
          "change the geometry under them and probes would silently skip " +
          "the streamed rows — rebuild into a fresh indexDir")
    }
    val bits = if (bitsPerTable > 0) bitsPerTable
      else Dedup.bitsPerTableFor(emb.count())
    // RE-seed: drop the old delta=-1 BEFORE certifying the new geometry —
    // otherwise a crash between the geometry write and the delta overwrite
    // leaves OLD-hyperplane data under a NEW-geometry certificate, a
    // mixed state that passes the start() handshake and probes to nothing
    val oldSeed = new org.apache.hadoop.fs.Path(s"$indexDir/delta=-1")
    if (fs.exists(oldSeed)) FsOps.deleteOrThrow(fs, oldSeed, recursive = true)
    // geometry BEFORE data: a crash between the two writes must leave an
    // index whose _geometry already certifies the hyperplanes delta=-1 was
    // (about to be) bucketed under (geometry-with-no-data starts cleanly);
    // the reverse order leaves data with no geometry, and a later start()
    // would be invited to adopt whatever parameters it was called with
    // (the silent-miss state this row exists to prevent)
    writeGeometry(emb.sparkSession, indexDir, nTables, bits, dim)
    Dedup.embeddingBuckets(emb, idCol, embCol, dim, nTables, bits)
      .write.mode("overwrite").parquet(s"$indexDir/delta=-1")
    // re-verify AFTER writing: the pre-check above is unlocked, so a LIVE
    // start() stream racing this seed can commit a delta between the check
    // and the writes — that delta is bucketed under the OLD hyperplanes
    // while the fresh _geometry certifies the new ones. Detect the race and
    // fail loudly instead of leaving a mixed-geometry index that runs
    // green. (Operationally: stop the stream before re-seeding — this
    // check converts forgetting that rule into an error, not a silent
    // recall hole.)
    if (fs.exists(root)) {
      val raced = fs.listStatus(root).map(_.getPath.getName)
        .filter(n => n.startsWith("delta=") && n != "delta=-1")
      require(raced.isEmpty,
        s"index at $indexDir gained ${raced.length} streaming delta(s) " +
          s"(${raced.take(3).mkString(", ")}) WHILE seed() was writing — a " +
          "live start() stream raced the re-seed, and those deltas are " +
          "bucketed under different hyperplanes than the new _geometry " +
          "certifies. Stop the stream before re-seeding; this index is now " +
          "mixed-geometry — rebuild into a fresh indexDir")
    }
  }

  private def writeGeometry(spark: SparkSession, indexDir: String,
      nTables: Int, bits: Int, dim: Int): Unit =
    spark.createDataFrame(Seq((nTables, bits, dim)))
      .toDF("n_tables", "bits_per_table", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/_geometry")

  /** The index's persisted LSH geometry, if it carries one (indexes seeded
    * before the `_geometry` row existed do not — their callers must keep
    * passing the original parameters).
    */
  def readGeometry(spark: SparkSession,
      indexDir: String): Option[(Int, Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/_geometry")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(s"$indexDir/_geometry").head()
      Some((r.getAs[Int]("n_tables"), r.getAs[Int]("bits_per_table"),
        r.getAs[Int]("dim")))
    }
  }

  /** Start the streaming near-dup detector. Output rows land in
    * `outDir/batch=<id>/` as (id_new, id_other, cos, with id_other from
    * the seed, an earlier batch, or a smaller same-batch id).
    */
  /** `adoptGeometry`: a pre-geometry index (seeded before the `_geometry`
    * row existed) already holds delta data whose hyperplanes are whatever
    * its original caller used — start() cannot verify that the parameters
    * passed NOW match them, so certifying them as the index's geometry is
    * refused by default (wrong params enshrined make every future probe
    * miss the pre-existing rows AND make later mismatch errors point the
    * wrong way). Pass true only when the parameters are known to be the
    * index's original ones.
    */
  def start(emb: DataFrame, idCol: String, embCol: String, dim: Int,
      indexDir: String, outDir: String, checkpointDir: String,
      threshold: Double = 0.9, nTables: Int = 12, bitsPerTable: Int = 4,
      roundScale: Int = 4,
      trigger: Trigger = Trigger.AvailableNow(),
      adoptGeometry: Boolean = false): StreamingQuery = {
    // a probe bucketed under DIFFERENT hyperplanes than the index's rows
    // never collides with them — the stream would run green while finding
    // nothing. Refuse a geometry mismatch up front (the PqIndex pre-band
    // discipline: silent recall loss must be an error, not a log line).
    // A stream can't auto-size (the corpus is unbounded), so bits must be
    // explicit here or come from a seeded geometry; and an index CREATED
    // by streaming (no seed) persists its geometry on first start so a
    // later restart under different parameters is refused too — the
    // protection must not depend on how the index was born.
    require(bitsPerTable > 0 && nTables > 0,
      "start() needs an explicit LSH geometry: pass the values from " +
        "EmbeddingIndex.readGeometry(spark, indexDir) (seeded index) or " +
        "choose bitsPerTableFor(expected corpus rows) for a fresh stream")
    readGeometry(emb.sparkSession, indexDir) match {
      case Some((t, b, d)) =>
        require(t == nTables && b == bitsPerTable && d == dim,
          s"index at $indexDir carries geometry (nTables=$t, " +
            s"bitsPerTable=$b, dim=$d) but start() was given (nTables=$nTables, " +
            s"bitsPerTable=$bitsPerTable, dim=$dim) — probes under a different " +
            "geometry silently miss every indexed row; pass the carried values " +
            "or rebuild the index")
      case None =>
        // an index that already holds delta data but no _geometry (seeded
        // pre-r9, or a pre-r10 crash between its data and geometry writes)
        // was bucketed under parameters this call cannot verify — writing
        // the CALLER's parameters as the certified geometry would enshrine
        // a guess: if wrong, probes miss every pre-existing row and future
        // mismatch errors blame the wrong side. Refuse unless the caller
        // explicitly vouches for the parameters.
        val root = new org.apache.hadoop.fs.Path(indexDir)
        val fs = root.getFileSystem(
          emb.sparkSession.sparkContext.hadoopConfiguration)
        val existing =
          if (!fs.exists(root)) Array.empty[String]
          else fs.listStatus(root).map(_.getPath.getName)
            .filter(_.startsWith("delta="))
        require(existing.isEmpty || adoptGeometry,
          s"index at $indexDir holds ${existing.length} delta dir(s) " +
            s"(${existing.take(3).mkString(", ")}) but no _geometry row — its " +
            "hyperplanes are unknown to this call, so adopting " +
            s"(nTables=$nTables, bitsPerTable=$bitsPerTable, dim=$dim) as the " +
            "certified geometry is refused: if they differ from the original " +
            "seed's, probes silently miss every pre-existing row. Pass " +
            "adoptGeometry = true only if these ARE the original parameters, " +
            "or rebuild the index with seed()")
        if (existing.nonEmpty)
          System.err.println(s"[graft] WARNING: adopting caller-supplied " +
            s"geometry (nTables=$nTables, bitsPerTable=$bitsPerTable, dim=$dim) " +
            s"for pre-geometry index $indexDir with ${existing.length} existing " +
            "delta(s) — certified correct only if these match the original seed")
        writeGeometry(emb.sparkSession, indexDir, nTables, bitsPerTable, dim)
    }
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        // erased-id replay guard at batch entry ([[ErasedKeys]], written by
        // IndexErase.eraseFromEmbeddingIndex): a crash-replayed batch must
        // not re-index or pair an erased id
        val batch = ErasedKeys.dropErased(batch0, indexDir, "id", idCol,
          "EmbeddingIndex append")
        // bb feeds both probes and the delta write — persist so the
        // hyperplane bucketing runs once per batch, not three times
        val bb = Dedup.embeddingBuckets(batch, idCol, embCol, dim, nTables, bitsPerTable)
          .persist()
        try {
        val idx = CorpusIndex.readDeltas(spark, indexDir, bucketSchema(dim), batchId)
        val cos = round(
          graft.functions.VectorFunctions.dot(col("ea"), col("eb"))
            / (col("na") * col("nb")), roundScale)
        // probe 1: batch vs accumulated index (id_other always earlier);
        // id inequality guards against an at-least-once redelivery of an
        // already-indexed id pairing with itself (cos = 1.0). Pairs whose
        // BOTH members sit in the current batch are probe 2's job — on a
        // redelivery both are also in the index, and probe 1 would emit
        // the pair in both orientations ((a,b) AND (b,a)), which distinct()
        // cannot collapse; the anti-join leaves exactly probe 2's canonical
        // (greater, smaller) row for them
        val batchIds = bb.select(col("id").as("id_other")).distinct()
        val vsIndex = bb.select(col("tb"), col("id").as("id_new"),
            col("e").as("ea"), col("nrm").as("na"))
          .join(idx.select(col("tb"), col("id").as("id_other"),
            col("e").as("eb"), col("nrm").as("nb")), Seq("tb"))
          .where(col("id_other") =!= col("id_new"))
          .join(broadcast(batchIds), Seq("id_other"), "left_anti")
        // probe 2: within-batch, smaller id is the "other" side
        val vsSelf = bb.select(col("tb"), col("id").as("id_new"),
            col("e").as("ea"), col("nrm").as("na"))
          .join(bb.select(col("tb"), col("id").as("id_other"),
            col("e").as("eb"), col("nrm").as("nb")), Seq("tb"))
          .where(col("id_other") < col("id_new"))
        vsIndex.unionByName(vsSelf)
          .select(col("id_new"), col("id_other"),
            col("ea"), col("eb"), col("na"), col("nb"))
          .distinct() // a pair may collide in several tables
          .select(col("id_new"), col("id_other"), cos.as("cos"))
          .where(col("cos") >= threshold)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        bb.write.mode("overwrite").parquet(s"$indexDir/delta=$batchId")
        } finally { bb.unpersist(); () }
      }
      .start()
  }
}
