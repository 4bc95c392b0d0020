package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Erasure propagation into PERSISTED indexes — the totality half of the
  * GDPR story ([[Erase]] is the lake half; the reference's 365-day replay
  * retention, README.md:83, implies erasure must reach every copy). A
  * persisted ANN index stores erased ids' FULL VECTORS in its cell
  * partitions and append deltas; the streaming dedup indexes keep their
  * fingerprints, shingle arrays, and LSH signatures. Filtering at serve
  * time is not erasure — the bytes must be gone from disk.
  *
  * Every component rewrite goes through [[Erase.eraseKeys]]: a key-pruned
  * locate scan (`_metadata.file_path` semi-join — only files that actually
  * hold a target key are opened or rewritten), then the crash-recoverable
  * intent → promote → commit-marker protocol of [[Compact]] under the
  * [[LockProvider]] seam, per component directory. Geometry (centroids,
  * codebooks, grids, routers, sharding) is UNTOUCHED: erasing rows from a
  * cell never changes what the quantizer certifies, and rewritten data
  * files get fresh names so [[graft.operators.IndexMeta]]'s signature
  * validation is unaffected (it only caches geometry dirs).
  *
  * Ordering contract: erase an id AFTER its last ingest. A concurrent
  * append of OTHER ids composes (the append lands new files/deltas the
  * locate scan either sees whole or not at all — pinned in
  * IndexEraseSpec's live-append race). A REPLAY of a crashed batch that
  * re-delivers the erased id is guarded by the `_erased` tombstone each
  * entry point records at the index root ([[ErasedKeys]], r14): the
  * streaming/append ingest paths probe it and drop the id instead of
  * silently re-introducing it (ErasedGuardSpec).
  *
  * A component whose every row is erased keeps its directory but loses its
  * files; serving an index erased to literal emptiness fails loudly on the
  * empty scan rather than returning silent empties.
  */
object IndexErase {

  /** The data components of each index family — shared with the erasure
    * certificate ([[Erase.verify]]) so the erase side and the verify side
    * can never drift: a component added here is both erased and scanned.
    */
  private[graft] val IvfComponents = Seq("corpus", "deltas")
  private[graft] val PqComponents =
    Seq("codes", "vectors", "codes_deltas", "vectors_deltas")
  private[graft] val NearComponents = Seq("bands", "arrays")

  /** Per-component erase outcome: (component path, files retired, files
    * rewritten). A component absent from the index (no deltas yet) reports
    * (0, 0).
    */
  final case class Report(components: Seq[(String, Compact.Stats)]) {
    def retired: Int = components.map(_._2.filesBefore).sum
    def written: Int = components.map(_._2.filesAfter).sum
  }

  /** Erase `ids` from a [[Similarity.buildIvfIndex]] index (corpus + append
    * deltas). Sharded and routed indexes (a `_sharding` row) recurse into
    * every shard — id-hash routing means any shard can hold an id, and
    * space-routed shards are resolved by content anyway.
    */
  def eraseFromIvfIndex(spark: SparkSession, indexDir: String, ids: DataFrame,
      lock: LockProvider = FsLeaseLock): Report =
    withTombstone(spark, indexDir, "nid", ids, lock) { mat =>
      Similarity.readSharding(spark, indexDir) match {
        case Some(n) => shardReport(n, sh =>
          eraseFromIvfIndex(spark, s"$indexDir/shard=$sh", mat, lock))
        case None => Report(IvfComponents.map(c =>
          s"$indexDir/$c" ->
            eraseComponent(spark, s"$indexDir/$c", "nid", mat, lock)))
      }
    }

  /** Erase `ids` from a [[graft.operators.PqIndex.buildPqIvfIndex]] index:
    * BOTH tiers (codes + vectors) and both delta families. Sharded indexes
    * recurse. Codebooks/centroids are untouched.
    */
  def eraseFromPqIvfIndex(spark: SparkSession, indexDir: String, ids: DataFrame,
      lock: LockProvider = FsLeaseLock): Report =
    withTombstone(spark, indexDir, "nid", ids, lock) { mat =>
      Similarity.readSharding(spark, indexDir) match {
        case Some(n) => shardReport(n, sh =>
          eraseFromPqIvfIndex(spark, s"$indexDir/shard=$sh", mat, lock))
        case None => Report(PqComponents.map(c =>
          s"$indexDir/$c" ->
            eraseComponent(spark, s"$indexDir/$c", "nid", mat, lock)))
      }
    }

  /** Erase `ids` from a [[graft.operators.SqAnn.buildSqIvfIndex]] index —
    * the PQ layout with byte codes; same four data components.
    */
  def eraseFromSqIvfIndex(spark: SparkSession, indexDir: String, ids: DataFrame,
      lock: LockProvider = FsLeaseLock): Report =
    withTombstone(spark, indexDir, "nid", ids, lock) { mat =>
      Report(PqComponents.map(c =>
        s"$indexDir/$c" ->
          eraseComponent(spark, s"$indexDir/$c", "nid", mat, lock)))
    }

  /** Erase `ids` from a [[EmbeddingIndex]] (streaming sign-LSH near-dup
    * index): every delta's (id, vector, norm, bucket) rows for the ids are
    * rewritten away; `_geometry` is untouched.
    */
  def eraseFromEmbeddingIndex(spark: SparkSession, indexDir: String,
      ids: DataFrame, lock: LockProvider = FsLeaseLock): Report =
    withTombstone(spark, indexDir, "id", ids, lock) { mat =>
      Report(Seq(
        indexDir -> eraseComponent(spark, indexDir, "id", mat, lock)))
    }

  /** Erase `ids` from a [[CorpusIndex.seedNear]]/startNear near-dup index:
    * both the LSH band signatures and the shingle arrays.
    */
  def eraseFromNearIndex(spark: SparkSession, indexDir: String,
      ids: DataFrame, lock: LockProvider = FsLeaseLock): Report =
    withTombstone(spark, indexDir, "id", ids, lock) { mat =>
      Report(NearComponents.map(c =>
        s"$indexDir/$c" ->
          eraseComponent(spark, s"$indexDir/$c", "id", mat, lock)))
    }

  /** Erase FINGERPRINTS from a [[CorpusIndex]] exact-dedup index. The index
    * stores fingerprints only (no doc ids), so the caller supplies the
    * erased docs' fingerprints — compute them with
    * `TextFunctions.fingerprint` over the erased texts, exactly as the
    * index did. ORDERING: run this BEFORE [[Erase.eraseKeys]] deletes the
    * texts from the lake — once the text is gone its fingerprint is
    * unrecoverable and would sit in the index forever. Note the dedup
    * consequence: a future re-ingest of an erased document classifies as
    * `new` again but is NOT re-indexed while its tombstone stands (the
    * replay guard cannot tell a genuine re-ingest from a replay) — clear
    * the tombstone deliberately (`ErasedKeys.clear`) to let erased
    * content re-enter the corpus.
    */
  def eraseFingerprints(spark: SparkSession, indexDir: String,
      fps: DataFrame, lock: LockProvider = FsLeaseLock): Report =
    withTombstone(spark, indexDir, "fp", fps, lock) { mat =>
      Report(Seq(
        indexDir -> eraseComponent(spark, indexDir, "fp", mat, lock)))
    }

  /** One component directory (any hive-partitioned parquet tree — cell
    * partitions, delta=N/cell=M deltas, flat delta dirs) through the lake
    * erase machinery. A missing/empty component is a clean no-op.
    * Components never tombstone — the index ROOT records one sidecar the
    * streaming append paths probe ([[ErasedKeys]]).
    */
  private def eraseComponent(spark: SparkSession, dir: String, keyCol: String,
      keys: DataFrame, lock: LockProvider): Compact.Stats =
    Erase.eraseKeys(spark, dir, keyCol, keys, manifestDir = None, lock = lock,
      tombstone = false)

  /** Run `erase`, then record the ids as tombstones at the index root —
    * the replay guard ([[ErasedKeys]]): a crash-replayed batch carrying an
    * erased id is dropped by the index's append path instead of silently
    * re-introducing it. Recorded only on success. A sharded index records
    * at the top level AND (via the recursion) at each shard root, so an
    * append addressed at either level hits a tombstone.
    */
  private def withTombstone(spark: SparkSession, indexDir: String,
      keyCol: String, ids: DataFrame,
      lock: LockProvider)(erase: DataFrame => Report): Report = {
    // materialize the id set BEFORE the erase: `ids` is lazily planned and
    // may derive from the index/corpus being erased — re-executing it
    // after the rewrite would scan retired files (or resolve empty and
    // record nothing). The erase body gets the materialized frame too.
    val mat = ids.toDF(ids.columns: _*).distinct().persist()
    try {
      mat.count()
      val r = erase(mat)
      ErasedKeys.record(spark, indexDir, keyCol, mat)
      // the fold rides the CALLER's lock seam: on a deployment with a
      // custom provider an FsLeaseLock fold would be effectively unlocked
      ErasedKeys.foldIfQuiet(spark, indexDir, keyCol, lock)
      r
    } finally { mat.unpersist(); () }
  }

  private def shardReport(nShards: Int, f: Int => Report): Report =
    Report((0 until nShards).flatMap(sh => f(sh).components))
}
