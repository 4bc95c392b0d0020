package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqIndex, Similarity, SqAnn}
import graft.streaming.{CorpusIndex, EmbeddingIndex, IndexErase}

/** Erasure propagation into persisted indexes (r12 verdict ask #1): the
  * bytes must be GONE from the index data dirs (raw reads, not serve-path
  * filters), serves must never return an erased id, survivors must be
  * served exactly as before, and a live append must compose with a
  * concurrent erase.
  */
class IndexEraseSpec extends SparkSuite {
  import spark.implicits._

  private def emb = graft.queries.Registry.tbl(spark, sfDir, "embeddings")
  private def queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding"))
  private def corpus = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("id"), col("embedding"))

  /** Every raw row of the parquet tree(s), bypassing all serve-path
    * machinery — the bytes-gone witness.
    */
  private def rawIds(dir: String, keyCol: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!graft.streaming.FsOps.anyParquet(fs, p, skipHidden = true)) Set.empty
    else spark.read.parquet(dir).select(col(keyCol).cast("long"))
      .as[Long].collect().toSet
  }

  test("IVF index: erased ids gone from corpus AND deltas; serve exact on survivors") {
    val base = tmpDir("graft-ie-ivf-")
    val built = corpus.filter(pmod(xxhash64(col("id")), lit(5)) < 4)
    Similarity.buildIvfIndex(built, s"$base/index", nlist = 8)
    Similarity.appendToIvfIndex(
      corpus.filter(pmod(xxhash64(col("id")), lit(5)) === 4),
      s"$base/index", deltaId = 0)
    val rawIds0 = corpus.select(col("id")).as[Long].collect().toSet
    val erasedIds = corpus.filter(pmod(col("id"), lit(7)) === 0)
      .select(col("id")).as[Long].collect().toSet
    assert(erasedIds.nonEmpty)
    // some erased ids must live in the delta too, or the test under-covers
    val deltaIds = rawIds(s"$base/index/deltas", "nid")
    assert(deltaIds.exists(erasedIds), "fixture: erased set must hit the delta")

    val report = IndexErase.eraseFromIvfIndex(spark, s"$base/index",
      erasedIds.toSeq.toDF("id"))
    assert(report.retired > 0 && report.written > 0)

    // bytes gone: raw reads of both data components see no erased id
    assert(rawIds(s"$base/index/corpus", "nid").intersect(erasedIds).isEmpty)
    assert(rawIds(s"$base/index/deltas", "nid").intersect(erasedIds).isEmpty)
    // untouched-file discipline: only files holding erased ids were rewritten
    val survivors = rawIds(s"$base/index/corpus", "nid") ++
      rawIds(s"$base/index/deltas", "nid")
    assert(survivors == (rawIds0 -- erasedIds), "survivors must be exactly the non-erased ids")

    // serve: full probe == brute force over the survivor corpus (geometry
    // untouched, so full-probe IVF is exact by construction)
    val kept = corpus.join(erasedIds.toSeq.toDF("id"), Seq("id"), "left_anti")
    val full = Similarity.ivfIndexQuery(queries, s"$base/index", k = 5, nprobe = 1000)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceKnn(queries, kept, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(full == exact, "post-erase full-probe serve must equal brute force on survivors")
    assert(!full.exists(p => erasedIds(p._2)))
    // control files cleaned up (the two-phase protocol completed)
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    for (c <- Seq("corpus", "deltas"); m <- Seq("intent", "promoted", "stage"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/index/$c/_compact/$m")),
        s"$c/_compact/$m must be gone")
  }

  test("sharded IVF index: erasure recurses into every shard") {
    val base = tmpDir("graft-ie-shard-")
    Similarity.buildIvfIndexSharded(corpus, s"$base/index", nShards = 2, nlist = 8)
    val erased = corpus.orderBy(col("id")).limit(20)
      .select(col("id")).as[Long].collect().toSet
    IndexErase.eraseFromIvfIndex(spark, s"$base/index", erased.toSeq.toDF("id"))
    for (sh <- 0 until 2)
      assert(rawIds(s"$base/index/shard=$sh/corpus", "nid")
        .intersect(erased).isEmpty, s"shard $sh still holds erased ids")
    val got = Similarity.ivfIndexQuerySharded(queries, s"$base/index", k = 5,
      nprobe = 1000).select("nid").as[Long].collect().toSet
    assert(got.intersect(erased).isEmpty)
  }

  test("routed IVF index: erasure recurses per shard; the router survives") {
    val base = tmpDir("graft-ie-routed-")
    Similarity.buildIvfIndexRouted(corpus, s"$base/index", nShards = 3, nlist = 4)
    val erased = corpus.orderBy(col("id")).limit(20)
      .select(col("id")).as[Long].collect().toSet
    IndexErase.eraseFromIvfIndex(spark, s"$base/index", erased.toSeq.toDF("id"))
    for (sh <- 0 until 3)
      assert(rawIds(s"$base/index/shard=$sh/corpus", "nid")
        .intersect(erased).isEmpty, s"shard $sh still holds erased ids")
    // geometry untouched: the router still routes, narrow serve still works
    assert(spark.read.parquet(s"$base/index/_router").count() == 3)
    val got = Similarity.ivfIndexQueryRouted(queries, s"$base/index", k = 5,
      nprobe = 1000, routeShards = 3).select("nid").as[Long].collect().toSet
    assert(got.nonEmpty && got.intersect(erased).isEmpty)
  }

  test("PQ and SQ8 indexes: both tiers and both delta families rewritten") {
    val base = tmpDir("graft-ie-pq-")
    PqIndex.buildPqIvfIndex(corpus, s"$base/pq", dim = 64, nlist = 8, m = 8, ksub = 16)
    PqIndex.appendToPqIvfIndex(
      emb.filter(col("vec_id") < 10) // re-use the query rows as an append batch
        .select((col("vec_id") + 5000000L).as("id"), col("embedding")),
      s"$base/pq", deltaId = 0)
    SqAnn.buildSqIvfIndex(corpus, s"$base/sq", nlist = 8)
    val erased = (corpus.orderBy(col("id")).limit(15)
      .select(col("id")).as[Long].collect().toSet + 5000005L).filter(_ != 0L)
    val edf = erased.toSeq.toDF("id")
    IndexErase.eraseFromPqIvfIndex(spark, s"$base/pq", edf)
    IndexErase.eraseFromSqIvfIndex(spark, s"$base/sq", edf)
    for (c <- Seq("codes", "vectors", "codes_deltas", "vectors_deltas"))
      assert(rawIds(s"$base/pq/$c", "nid").intersect(erased).isEmpty,
        s"pq/$c still holds erased ids")
    for (c <- Seq("codes", "vectors"))
      assert(rawIds(s"$base/sq/$c", "nid").intersect(erased).isEmpty,
        s"sq/$c still holds erased ids")
    // serves still work and never return an erased id
    val pqGot = PqIndex.pqIvfQuery(queries, s"$base/pq", k = 5, nprobe = 8)
      .select("nid").as[Long].collect().toSet
    assert(pqGot.nonEmpty && pqGot.intersect(erased).isEmpty)
    val sqGot = SqAnn.sqIvfQuery(queries, s"$base/sq", k = 5, nprobe = 8)
      .select("nid").as[Long].collect().toSet
    assert(sqGot.nonEmpty && sqGot.intersect(erased).isEmpty)
  }

  test("streaming indexes: embedding LSH, near-dup bands/arrays, fingerprints") {
    val base = tmpDir("graft-ie-stream-")
    // embedding index: seed + erase by id
    EmbeddingIndex.seed(emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", dim = 64, s"$base/emb")
    val erased = Set(10L, 11L, 12L)
    IndexErase.eraseFromEmbeddingIndex(spark, s"$base/emb", erased.toSeq.toDF("id"))
    assert(rawIds(s"$base/emb", "id").intersect(erased).isEmpty)
    // geometry untouched
    assert(EmbeddingIndex.readGeometry(spark, s"$base/emb").isDefined)

    // near-dup index: bands + arrays by id
    val docs = graft.queries.Registry.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    CorpusIndex.seedNear(docs, "doc_id", "text", s"$base/near")
    val someIds = docs.orderBy("doc_id").limit(3)
      .select(col("doc_id")).as[Long].collect().toSet
    IndexErase.eraseFromNearIndex(spark, s"$base/near", someIds.toSeq.toDF("id"))
    assert(rawIds(s"$base/near/bands", "id").intersect(someIds).isEmpty)
    assert(rawIds(s"$base/near/arrays", "id").intersect(someIds).isEmpty)
    assert(CorpusIndex.readNearGeometry(spark, s"$base/near").isDefined)

    // fingerprint index: erase by fp (computed exactly as the index did)
    CorpusIndex.seed(docs, "doc_id", "text", s"$base/fp")
    val fps = docs.where(col("doc_id").isInCollection(someIds))
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val fpSet = fps.as[String].collect().toSet
    IndexErase.eraseFingerprints(spark, s"$base/fp", fps)
    val left = spark.read.parquet(s"$base/fp").select("fp").as[String].collect().toSet
    assert(left.intersect(fpSet).isEmpty, "erased fingerprints must be gone")
    assert(left.nonEmpty, "non-erased fingerprints must survive")
  }

  test("live-append race: an append of fresh ids composes with a concurrent erase") {
    val base = tmpDir("graft-ie-race-")
    Similarity.buildIvfIndex(corpus, s"$base/index", nlist = 8)
    val erased = corpus.orderBy(col("id")).limit(25)
      .select(col("id")).as[Long].collect().toSet
    val appended = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 9000000L).as("id"), col("embedding"))
    // race: the erase rewrites corpus files while the append lands a new
    // delta — disjoint trees, but both mutate under indexDir concurrently
    val appender = new Thread(() =>
      Similarity.appendToIvfIndex(appended, s"$base/index", deltaId = 0))
    appender.start()
    IndexErase.eraseFromIvfIndex(spark, s"$base/index", erased.toSeq.toDF("id"))
    appender.join()
    val corpusLeft = rawIds(s"$base/index/corpus", "nid")
    val deltaLeft = rawIds(s"$base/index/deltas", "nid")
    assert(corpusLeft.intersect(erased).isEmpty, "erased ids gone from corpus")
    val appendedIds = appended.select(col("id")).as[Long].collect().toSet
    assert(appendedIds.subsetOf(corpusLeft ++ deltaLeft),
      "the racing append's rows must all survive")
    // serve sees survivors + appended, never erased
    val got = Similarity.ivfIndexQuery(queries, s"$base/index", k = 5,
      nprobe = 1000).select("nid").as[Long].collect().toSet
    assert(got.intersect(erased).isEmpty)
  }
}
