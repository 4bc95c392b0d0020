package graft

import org.apache.spark.sql.functions._
import graft.operators.{PqIndex, Similarity}

/** Incremental ingest into the persisted vector indexes (r11): a corpus
  * that grows daily appends assignment-only deltas instead of rebuilding —
  * under the CorpusIndex idempotent-delta protocol (overwrite-by-deltaId,
  * newest-delta-excluded compaction), with the geometry/refusal discipline
  * of the builds (dim-validated appends only, drift-skewed batches
  * refused with a refit instruction).
  */
class IncrementalIvfSpec extends SparkSuite {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding"))
  private def fullCorpus = emb.filter(col("vec_id") >= 5)
    .select(col("vec_id").as("id"), col("embedding"))
  /** Built/appended split by ID HASH (a uniform draw), not id range: the
    * recall-parity contract assumes appends drawn from the corpus
    * distribution. An id-RANGE split on this testdata is a genuine drift
    * (ids correlate with embedding clusters) — appending it measurably
    * degrades nprobe recall, which is exactly the scenario the skew gate
    * exists for, not the steady-growth case this spec pins.
    */
  private def part(r: Int) = fullCorpus.filter(pmod(xxhash64(col("id")), lit(5)) === r)
  private def builtPart = fullCorpus.filter(pmod(xxhash64(col("id")), lit(5)) < 3)
  private def appendPart(lo: Int, hi: Int) =
    fullCorpus.filter(col("id") >= lo && col("id") < hi)

  private def topkSet(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recall(approx: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame): Double = {
    val e = topkSet(exact)
    val hits = topkSet(approx).count(e.contains)
    hits.toDouble / e.size
  }

  test("appended rows serve under the SAME plan as built rows: full-probe merge is exact") {
    val dir = s"${tmpDir("graft-inc-")}/index"
    Similarity.buildIvfIndex(builtPart, dir, nlist = 8)
    Similarity.appendToIvfIndex(part(3), dir, deltaId = 0)
    Similarity.appendToIvfIndex(part(4), dir, deltaId = 1)
    // nprobe = nlist scans every cell: the serve must reproduce the exact
    // brute-force top-k over built ∪ appended, bit for bit
    val full = Similarity.ivfIndexQuery(queries, dir, k = 5, nprobe = 8)
    val exact = Similarity.bruteForceKnn(queries, fullCorpus, k = 5)
    assert(topkSet(full) == topkSet(exact))
  }

  test("recall after N appended batches: appended neighbors found as well as built ones") {
    val base = tmpDir("graft-increcall-")
    Similarity.buildIvfIndex(builtPart, s"$base/inc", nlist = 8)
    Similarity.appendToIvfIndex(part(3), s"$base/inc", deltaId = 0)
    Similarity.appendToIvfIndex(part(4), s"$base/inc", deltaId = 1)
    val manyQ = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding"))
    val exactPairs = topkSet(Similarity.bruteForceKnn(manyQ, fullCorpus, k = 5))
    val gotPairs = topkSet(
      Similarity.ivfIndexQuery(manyQ, s"$base/inc", k = 5, nprobe = 4))
    val appendedIds = (part(3).select("id").collect() ++ part(4).select("id").collect())
      .map(_.getLong(0)).toSet
    // split the ground truth by WHERE the true neighbor lives: a broken
    // append path (mis-assigned cells) craters the appended side while the
    // built side is untouched — measuring both on the SAME index isolates
    // the append machinery from quantizer sample variance (which at 495
    // rows swings fresh-vs-incremental recall by itself; the fresh-vs-
    // incremental comparison is the sf10 AnnRecall tier's job, where the
    // bounded fit sample makes the two quantizers statistically identical)
    val (appPairs, builtPairs) = exactPairs.partition(p => appendedIds.contains(p._2))
    val rApp = appPairs.count(gotPairs.contains).toDouble / appPairs.size
    val rBuilt = builtPairs.count(gotPairs.contains).toDouble / builtPairs.size
    assert(appPairs.size >= 20, s"split too thin to measure (${appPairs.size})")
    assert(rApp >= rBuilt - 0.15,
      s"appended-neighbor recall $rApp collapsed vs built-neighbor recall $rBuilt")
    assert(rApp >= 0.6, s"appended-neighbor recall $rApp below the serving floor")
  }

  test("append is idempotent per deltaId; compaction folds all but the newest delta") {
    val dir = s"${tmpDir("graft-incfold-")}/index"
    Similarity.buildIvfIndex(builtPart, dir, nlist = 8)
    Similarity.appendToIvfIndex(part(3), dir, deltaId = 0)
    // replayed batch id overwrites its own delta — row count unchanged
    Similarity.appendToIvfIndex(part(3), dir, deltaId = 0)
    assert(spark.read.parquet(s"$dir/deltas/delta=0").count() == part(3).count())
    Similarity.appendToIvfIndex(part(4).filter(col("id") % 2 === 0), dir, deltaId = 1)
    Similarity.appendToIvfIndex(part(4).filter(col("id") % 2 === 1), dir, deltaId = 2)
    val before = topkSet(Similarity.ivfIndexQuery(queries, dir, k = 5, nprobe = 8))
    // folds deltas 0 and 1 (newest stays for replay safety) into delta=-1
    assert(Similarity.compactIvfDeltas(spark, dir) == 2)
    val names = new java.io.File(s"$dir/deltas").listFiles()
      .map(_.getName).filter(_.startsWith("delta=")).toSet
    assert(names == Set("delta=-1", "delta=2"), names.toString)
    assert(topkSet(Similarity.ivfIndexQuery(queries, dir, k = 5, nprobe = 8)) == before)
    // compacting again with one base + one newest is a no-op
    assert(Similarity.compactIvfDeltas(spark, dir) == 0)
  }

  test("append refusals: wrong dim, pre-geometry index, drift-skewed batch") {
    val dir = s"${tmpDir("graft-increfuse-")}/index"
    Similarity.buildIvfIndex(builtPart, dir, nlist = 8)
    // wrong-dim append names both dims
    val bad = appendPart(300, 320)
      .select(col("id"), slice(col("embedding"), 1, 32).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(bad, dir, deltaId = 0)
    }
    assert(ex.getMessage.contains("32") && ex.getMessage.contains("dim=64"), ex.getMessage)
    // a pre-geometry index cannot validate appends — refused with a rebuild
    // instruction, never silently grown
    val g = new org.apache.hadoop.fs.Path(s"$dir/_geometry")
    assert(g.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(g, true))
    val ex2 = intercept[IllegalStateException] {
      Similarity.appendToIvfIndex(appendPart(300, 320), dir, deltaId = 0)
    }
    assert(ex2.getMessage.contains("rebuild"), ex2.getMessage)
    // a batch crowding into one cell (80 copies of one vector) is drift —
    // refused before any delta lands, naming the skew and the refit path
    val dir2 = s"${tmpDir("graft-incskew-")}/index"
    Similarity.buildIvfIndex(builtPart, dir2, nlist = 8)
    val one = appendPart(300, 301).select(col("embedding")).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    import spark.implicits._
    val skewed = (1000L until 1080L).map(i => (i, one)).toDF("id", "embedding")
    val ex3 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(skewed, dir2, deltaId = 0, maxCellSkew = 4.0)
    }
    assert(ex3.getMessage.contains("skewed") && ex3.getMessage.contains("REBUILD"),
      ex3.getMessage)
    assert(!new java.io.File(s"$dir2/deltas").exists(),
      "refused append still wrote a delta")
  }

  test("sharded append routes by the build's id-hash; full-probe serve stays exact") {
    val dir = s"${tmpDir("graft-incshard-")}/index"
    Similarity.buildIvfIndexSharded(builtPart, dir, nShards = 2, nlist = 4)
    Similarity.appendToIvfIndexSharded(
      fullCorpus.filter(pmod(xxhash64(col("id")), lit(5)) >= 3), dir, deltaId = 0)
    val full = Similarity.ivfIndexQuerySharded(queries, dir, k = 5, nprobe = 4)
    val exact = Similarity.bruteForceKnn(queries, fullCorpus, k = 5)
    assert(topkSet(full) == topkSet(exact))
  }

  test("PQ incremental ingest: appended vectors are found; dim refusal; compaction") {
    val dir = s"${tmpDir("graft-incpq-")}/index"
    PqIndex.buildPqIvfIndex(builtPart, dir, dim = 64, nlist = 4, m = 8, ksub = 16)
    PqIndex.appendToPqIvfIndex(appendPart(300, 370), dir, deltaId = 0)
    PqIndex.appendToPqIvfIndex(appendPart(370, 440), dir, deltaId = 1)
    PqIndex.appendToPqIvfIndex(appendPart(440, 500), dir, deltaId = 2)
    // probe WITH appended vectors themselves: each must find itself top-1
    // (exact rerank ⇒ cosine 1.0 with nid tie-break smallest = itself here)
    val selfQ = appendPart(450, 460).select(col("id").as("qid"), col("embedding"))
    val got = PqIndex.pqIvfQuery(selfQ, dir, k = 1, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (450L until 460L).foreach(q => assert(got.get(q).contains(q),
      s"appended vector $q not served (got ${got.get(q)})"))
    // wrong-dim append refused
    val bad = appendPart(300, 310)
      .select(col("id"), slice(col("embedding"), 1, 16).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      PqIndex.appendToPqIvfIndex(bad, dir, deltaId = 2)
    }
    assert(ex.getMessage.contains("dim=64"), ex.getMessage)
    // fold both tiers: deltas 0 and 1 fold per tier (newest excluded) = 4
    assert(PqIndex.compactPqIvfDeltas(spark, dir) == 4)
    val after = PqIndex.pqIvfQuery(selfQ, dir, k = 1, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after == got, "compaction changed serve results")
  }
}
