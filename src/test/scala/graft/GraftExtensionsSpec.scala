package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must make the native functions callable from
  * pure SQL in a session configured only with spark.sql.extensions — the
  * cluster-wide deployment shape (no Scala imports, no per-session
  * registration calls).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("the GraftExtensions entry point exposes the native functions to pure SQL") {
    // build a NEW session (fresh session state, extensions applied) on the
    // suite-shared SparkContext via the public withExtensions hook — the
    // same installer `spark.sql.extensions=graft.GraftExtensions` runs at
    // context build time (a static conf, so not settable on the shared
    // test context). The shared context must NOT be stopped — other
    // suites own it too.
    val shared = SparkSuite.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne shared, "a fresh session with its own extensions is required")
      val fnv = s.sql("SELECT fnv_hash64('a') AS h").collect().head.getLong(0)
      // published FNV-1a 64 test vector for "a"
      assert(fnv == 0xaf63dc4c8601ec8cL)
      val dp = s.sql(
        "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(dp == 11.0)
      val ng = s.sql(
        "SELECT word_ngrams(array('a', 'b', 'c'), 2) AS g")
        .collect().head.getSeq[String](0)
      assert(ng == Seq("a b", "b c"))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
