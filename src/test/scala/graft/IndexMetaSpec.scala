package graft

import org.apache.spark.sql.functions._

import graft.operators.{IndexMeta, Similarity}

/** The serve-metadata cache's correctness contract: entries revalidate
  * against the backing directory's content signature on EVERY access, so
  * an in-place rebuild (or append/compaction) can never serve stale
  * geometry/centroids — the classic cache bug the signature exists to
  * make impossible.
  */
class IndexMetaSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(shift: Double) =
    spark.range(100, 400).toDF("id")
      .withColumn("embedding", array(
        (col("id") % 7).cast("float") + lit(shift.toFloat),
        (col("id") % 11).cast("float"), (col("id") % 13).cast("float")))
  private def queries =
    spark.range(1, 6).toDF("qid") // from 1: qid 0 is the zero vector
      .withColumn("embedding", array(
        (col("qid") % 7).cast("float"), (col("qid") % 11).cast("float"),
        (col("qid") % 13).cast("float")))

  test("an in-place index rebuild is served fresh through the cache") {
    val dir = tmpDir("graft-imeta-") + "/index"
    Similarity.buildIvfIndex(corpus(0.0), dir, nlist = 4)
    val r1 = Similarity.ivfIndexQuery(queries, dir, k = 3, nprobe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().sorted.toSeq
    assert(r1.nonEmpty)
    // cache is warm now (geometry + centroids); rebuild IN PLACE with a
    // different nlist and a shifted corpus — every serve-side read must
    // notice the changed dir listing and reload
    Similarity.buildIvfIndex(corpus(100.0), dir, nlist = 2)
    val geom = Similarity.readIvfGeometry(spark, dir)
    assert(geom.exists(_._2 == 2), s"stale geometry served from cache: $geom")
    val r2 = Similarity.ivfIndexQuery(queries, dir, k = 3, nprobe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().sorted.toSeq
    // the rebuilt corpus is far from the queries in dim 0, so the exact
    // top-k changes; serving r1's answer again would prove a stale cache
    val exact2 = Similarity.bruteForceKnn(queries, corpus(100.0), k = 3)
      .select("qid", "nid").as[(Long, Long)].collect().sorted.toSeq
    assert(r2 == exact2, s"full-width probe must equal exact on the NEW corpus")
  }

  test("cached() revalidates by content signature, not by time") {
    val d = tmpDir("graft-imeta-sig-")
    val p = new org.apache.hadoop.fs.Path(d, "v.txt")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def put(s: String): Unit = {
      val o = fs.create(p, true); o.write(s.getBytes("UTF-8")); o.close()
    }
    put("one")
    var loads = 0
    def get(): String = IndexMeta.cached(spark, d, tag = "spec") {
      loads += 1
      new String(graft.streaming.FsOps.readString(fs, p).getBytes("UTF-8"))
    }
    assert(get() == "one" && get() == "one" && loads == 1,
      "unchanged dir must be served from cache")
    // same length, different content — mtime may tie at coarse resolution,
    // so force a distinguishable listing via a second file
    val p2 = new org.apache.hadoop.fs.Path(d, "v2.txt")
    val o2 = fs.create(p2, true); o2.write("x".getBytes("UTF-8")); o2.close()
    put("two")
    assert(get() == "two" && loads == 2,
      "a changed dir listing must reload through the loader")
  }
}
