package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Registry

/** Plan-quality gate (the 100 TB design discipline, SURVEY.md §7.3): these
  * assertions pin the physical-plan properties that keep the headline
  * queries scalable — pushdown reaching the scan, pruned read schemas,
  * broadcast dimensions, top-k short-circuits, rank-limit pushdown. A
  * regression that silently turns a broadcast join into a cartesian or
  * drops a pushed filter fails here, not at 100 TB.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String = {
    val df = Registry.byName(name).run(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q02 point lookup pushes the key predicate into the parquet scan") {
    val p = plan("q02_point_lookup")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(o_orderkey,42)"), p)
  }

  test("q01 scan reads only the 7 needed columns of 11 (column pruning)") {
    val p = plan("q01_pricing_summary")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey") &&
      !read.contains("l_suppkey") && !read.contains("l_linenumber"), read)
    assert(p.contains("LessThan(l_shipdate"), p)
  }

  test("q04 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q04_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q05 star join broadcasts every dimension (no shuffle join on dims)") {
    val p = plan("q05_nation_revenue")
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 4, s"want >=4 broadcast joins, got $broadcasts\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q41 knn pushes the rank limit below the window (WindowGroupLimit)") {
    val p = plan("q41_knn_bruteforce")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q24 latest-per-key also benefits from rank-limit pushdown") {
    val p = plan("q24_latest_per_user")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("whole-stage codegen covers the q20 aggregation pipeline") {
    val df = Registry.byName("q20_hourly_analytics").run(spark, sfDir)
    df.collect() // finalize the adaptive plan so codegen stages materialize
    val p = df.queryExecution.executedPlan.toString
    // "*(n) Op" prefixes mark WholeStageCodegen stages; both aggregates and
    // the sort must be inside generated stages
    assert(p.contains("*(1) HashAggregate") || p.contains("WholeStageCodegen"), p)
    assert(p.linesIterator.count(_.matches(".*\\*\\(\\d+\\) .*")) >= 3, p)
  }

  test("q01 plans the custom CentSum128 as a two-phase ObjectHashAggregate") {
    val df = Registry.byName("q01_pricing_summary").run(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the custom TypedImperativeAggregate runs in ObjectHashAggregate with
    // partial + final phases (map-side combine preserved)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_cent_sum_128") || p.contains("partial_centsum128")
      || p.toLowerCase.contains("partial_cent"), p)
  }

  test("no registry query plans a CartesianProduct (global plan hygiene)") {
    // intended all-pairs comparisons use broadcast nested-loop (small side
    // broadcast); an unhinted CartesianProduct would shuffle-explode at scale
    val skip = Set("q50_stream_deliver", "q51_stream_alerts", "q52_golden_row",
      "q53_stream_windowed_agg", "q54_stream_stream_join") // run streaming jobs, not plain plans
    Registry.all.filterNot(q => skip(q.name)).foreach { q =>
      val p = plan(q.name)
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a CartesianProduct:\n$p")
    }
  }

  test("batch queries execute under AQE (AdaptiveSparkPlan at the root)") {
    // the bench-tail "AQE disabled" warnings are STREAMING-only (Spark
    // disables AQE in stateful workloads); the batch path must keep it —
    // runtime re-planning is the skew/shuffle safety net at 100 TB
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    for (name <- Seq("q01_pricing_summary", "q05_nation_revenue", "q33_exact_dedup")) {
      val df = Registry.byName(name).run(spark, sfDir)
      val root = df.queryExecution.executedPlan
      assert(root.isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
          || root.find(_.isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]).isDefined,
        s"$name does not execute adaptively:\n$root")
    }
  }

  test("embedding near-dup pairs go through LSH buckets, not an all-pairs BNLJ") {
    // pins the scale path itself (registry q44 wraps it in a recall
    // contract whose exact-answer verifier is a deliberate small-scale BNLJ)
    val emb = Registry.tbl(spark, sfDir, "embeddings")
    val df = graft.operators.Dedup.embeddingNearDups(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.9)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"embeddingNearDups must pair within LSH buckets:\n$p")
  }

  test("q47 pipeline near-dup stage routes through the banded LSH join") {
    // pair generation must be the (band, band_sig) bucket join, and the
    // exact-Jaccard verify must be a native intersect_size over candidate pairs
    // — the plan must contain NO shingle-level self-join (which goes
    // near-quadratic on common shingles at corpus scale)
    val p = plan("q47_corpus_pipeline")
    assert(p.contains("band_sig"), s"q47 must generate pairs via LSH bands:\n$p")
    assert(p.contains("intersect_size"), s"q47's verify must be candidate-bounded:\n$p")
    assert(!p.matches("(?s).*\\[shingle#\\d+\\], \\[shingle#\\d+\\], Inner.*"),
      s"q47 must not join shingle tables on the shingle alone:\n$p")
  }

  test("q63 incremental dedup stays index-shaped: banded candidates, no shingle self-join") {
    val p = plan("q63_incremental_dedup")
    assert(p.contains("band_sig"), s"q63 candidates must come from the LSH band index:\n$p")
    assert(p.contains("intersect_size"), s"q63 verify must be candidate-bounded:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.matches("(?s).*\\[shingle#\\d+\\], \\[shingle#\\d+\\], Inner.*"),
      s"q63 must not join shingle tables on the shingle alone:\n$p")
  }

  test("q70 cluster pair generation is the banded LSH join, no shingle self-join") {
    // q70's returned plan is lineage-truncated by the clustering loop's
    // localCheckpoints, so pin the pair STAGE it feeds from: same banded
    // candidates + intersect_size verify contract as q47/q63
    import graft.operators.Dedup
    val docs = Registry.tbl(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val arrays = Dedup.shingleArrays(docs, "doc_id", "text", n = 3)
    val shingled = arrays.select(org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("sh")).as("shingle"))
    val pairs = Dedup.jaccardOnArrays(
      Dedup.lshCandidates(Dedup.minhashBands(shingled, k = 16, rowsPerBand = 2)), arrays)
    val p = pairs.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("band_sig"), s"cluster pairs must come from LSH bands:\n$p")
    assert(p.contains("intersect_size"), s"cluster verify must be candidate-bounded:\n$p")
    assert(!p.matches("(?s).*\\[shingle#\\d+\\], \\[shingle#\\d+\\], Inner.*"),
      s"cluster pair stage must not join shingle tables on the shingle alone:\n$p")
  }

  test("as-of join is a single key-shuffle (one Exchange below the window)") {
    val p = plan("q14_asof_join")
    // union of both sides shuffles once on the key for the carry-forward
    // window; no join operator (and so no join explosion) appears at all
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("q84 semantic dedup pairs only within KMeans cell bands — no all-pairs join") {
    import org.apache.spark.sql.functions.col
    val emb = Registry.tbl(spark, sfDir, "embeddings")
    val df = graft.operators.Similarity.semanticNearDups(
      emb, "vec_id", "embedding", threshold = 0.9, nClusters = 4)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the pair join is an equi-join on (cell, band) — cell-local AND
    // rank-band-local, so a skewed cell cannot go quadratic; a
    // BNLJ/cartesian would be the all-pairs shape the quantizer avoids
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size == 1, p)
    assert(joins.head.condition.get.references.exists(_.name == "cell"), p)
    assert(joins.head.condition.get.references.exists(_.name == "band"), p)
  }

  test("q85 epoch shuffle is a distributed range sort — no global rank window") {
    val p = plan("q85_epoch_shuffle")
    assert(!p.contains("Window"), p)
    assert(p.contains("Sort"), p)
    // rangepartitioning — the parallel sort; a single-partition Exchange
    // would serialize the epoch order through one task
    assert(p.toLowerCase.contains("rangepartitioning"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("q100 persisted IVF probe reads only the probed cells' partitions") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("graft-ivfidx-")
    val emb = Registry.tbl(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    graft.operators.Similarity.buildIvfIndex(corpus, s"$base/index", nlist = 8)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val df = graft.operators.Similarity.ivfIndexQuery(queries, s"$base/index",
      k = 5, nprobe = 2)
    // sparkPlan, not executedPlan: AQE wraps this multi-join query and
    // hides the leaves until execution
    val scans = df.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
        if sc.metadata.get("Location").exists(_.contains("index")) => sc
    }
    assert(scans.nonEmpty)
    val corpusScan = scans.find(_.metadata("Location").contains("corpus")).get
    assert(corpusScan.metadata("PartitionFilters").contains("cell"),
      corpusScan.metadata.toString)
    // the static isin() filter alone must prune (DPP subquery filters are
    // unevaluable before execution — drop them for the listing)
    val static = corpusScan.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    val readParts = corpusScan.relation.location
      .listFiles(static, corpusScan.dataFilters).size
    assert(readParts < 8, s"probe read $readParts of 8 cells — pruning lost")
  }

  test("q110 sharded IVF serve: every shard's probe scan is cell-pruned") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("graft-ivfshardplan-")
    val emb = Registry.tbl(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    graft.operators.Similarity.buildIvfIndexSharded(corpus, s"$base/index",
      nShards = 2, nlist = 8)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val df = graft.operators.Similarity.ivfIndexQuerySharded(queries,
      s"$base/index", k = 5, nprobe = 2)
    val scans = df.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
        if sc.metadata.get("Location").exists(_.contains("corpus")) => sc
    }
    // one corpus scan per shard, each with the q100 pruning shape
    assert(scans.size == 2, s"expected 2 shard scans, got ${scans.size}")
    scans.foreach { corpusScan =>
      assert(corpusScan.metadata("PartitionFilters").contains("cell"),
        corpusScan.metadata.toString)
      val static = corpusScan.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      val readParts = corpusScan.relation.location
        .listFiles(static, corpusScan.dataFilters).size
      assert(readParts < 8, s"shard probe read $readParts of 8 cells — pruning lost")
    }
  }

  test("partitioned lake point query prunes to the matching hour partition") {
    val base = tmpDir("graft-prune-")
    import org.apache.spark.sql.functions._
    // hive-layout lake written directly (catalog-partitioned path)
    val e = Registry.tbl(spark, sfDir, "events").limit(500)
    graft.codec.Envelope.withTimePartitions(e, col("ts"))
      .write.partitionBy("year", "month", "day", "hour").parquet(s"$base/lake")
    graft.catalog.LakeCatalog.registerLake(spark, "prune_test", s"$base/lake")
    val df = spark.sql("SELECT event_id FROM prune_test WHERE day = 3 AND hour = 12")
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val meta = scans.head.metadata
    assert(meta("PartitionFilters").contains("hour"), meta.toString)
    val allParts = spark.sql("SHOW PARTITIONS prune_test").count()
    val readParts = scans.head.relation.location.listFiles(
      scans.head.partitionFilters, scans.head.dataFilters).size
    assert(readParts < allParts, s"read $readParts of $allParts partitions")
  }

  test("dynamic partition pruning composes with zone pruning through the FileIndex") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmpDir("graft-dpp-")
    val lake = s"$base/lake"
    val mdir = s"$base/manifest"
    // 4 day partitions × 2 files each, disjoint event_id ranges per file:
    // a day dim filter DPP-prunes to day=0 (2 files), the event_id
    // predicate zone-prunes one of the two — composed, the scan reads 1/8
    for (d <- 0 until 4; j <- 0 until 2) {
      graft.streaming.Deliver.withInt64Timestamps(spark) {
        (0 until 500).map(i => (d * 1000L + j * 500L + i, s"u$i"))
          .toDF("event_id", "u").coalesce(1)
          .write.mode("append").parquet(s"$lake/day=$d")
      }
    }
    val hconf = spark.sessionState.newHadoopConf()
    val lfs = new org.apache.hadoop.fs.Path(lake).getFileSystem(hconf)
    val urls = graft.streaming.FsOps.walkParquet(lfs,
      new org.apache.hadoop.fs.Path(lake), skipHidden = true)
      .map(p => lfs.makeQualified(p).toString).sorted
    assert(urls.size == 8)
    graft.streaming.FsOps.atomicWrite(hconf, lfs,
      new org.apache.hadoop.fs.Path(mdir, "manifest-0000000000.json"),
      graft.streaming.ManifestChain.render(urls,
        Some(lfs.makeQualified(new org.apache.hadoop.fs.Path(lake)).toString))
        .getBytes("UTF-8"))
    graft.sources.ZoneMaps.write(hconf, mdir, 0L,
      graft.sources.ZoneMaps.fromFooters(hconf, urls, Seq("event_id")),
      compactEvery = 0)
    graft.catalog.LakeCatalog.registerPrunedView(spark, "dpp_fact", mdir)
    // the dim must be FILE-backed: a local Seq constant-folds into a
    // LocalRelation, whose filter leaves no filtering subquery for DPP to
    // reuse (found by probe — DPP never fires on a folded dim, any index)
    Seq((0, "keep"), (1, "drop"), (2, "drop"), (3, "drop"))
      .toDF("day", "tag").write.parquet(s"$base/dim")
    spark.read.parquet(s"$base/dim").createOrReplaceTempView("dpp_dim")
    val df = spark.sql(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(f.event_id) AS s
        |FROM dpp_fact f JOIN dpp_dim d ON f.day = d.day
        |WHERE d.tag = 'keep' AND f.event_id >= 500""".stripMargin)
    val row = df.collect().head
    // correctness: day 0, file j=1 → event_ids 500..999
    assert(row.getLong(0) == 500 && row.getLong(1) == (500L to 999L).sum,
      row.toString)
    // the fact scan carries a DynamicPruning partition filter... AQE query
    // stages are LEAF nodes, so the collect must recurse into stage plans
    def allScans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
      }.flatten
    val scans = allScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty,
      s"no file scans in the final plan:\n${df.queryExecution.executedPlan}")
    val scan = scans.find(_.metadata.get("Location").exists(_.contains("lake")))
      .getOrElse(scans.head)
    assert(scan.partitionFilters.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])),
      s"no DPP filter on the fact scan: ${scan.partitionFilters}")
    // ...and the EXECUTED metrics prove DPP (4→1 day) AND the zone prune
    // (2→1 file inside the surviving day) both fired: 1 of 8 files read
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles == 1,
      s"expected DPP ∘ zone-prune to read 1 of 8 files, read $numFiles")
  }
}
