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
      val is = s.sql(
        "SELECT intersect_size(array('a', 'b', 'c'), array('b', 'c', 'd')) AS n")
        .collect().head.getInt(0)
      assert(is == 2)
      val l2 = s.sql("SELECT l2_normalize(array(3.0D, 4.0D)) AS v")
        .collect().head.getSeq[Double](0)
      assert(math.abs(l2(0) - 0.6) < 1e-12 && math.abs(l2(1) - 0.8) < 1e-12)
      // pure-SQL PQ round-trip: with the PqSpec hand-built codebooks
      // (dim 4, m 2, ksub 2), ADC of encode(x) against table(q) must equal
      // the exact inner product of q_norm with x's reconstruction.
      // x = (1,0,0.5,0.5) normalizes then encodes to (c0, c0) ⇒ decode =
      // (1,0,0.5,0.5); q_norm = (0,1,-0.5,0.5)/√1.5 ⇒ ADC = ⟨q_norm,
      // decode⟩ = (0 + 0 − 0.25 + 0.25)/√1.5 = 0.
      val adc = s.sql(
        """SELECT pq_adc(
          |  pq_encode(array(1.0D, 0.0D, 0.5D, 0.5D),
          |            array(1.0D, 0.0D, 0.0D, 1.0D, 0.5D, 0.5D, -0.5D, 0.5D), 2, 2),
          |  pq_table(array(0.0D, 1.0D, -0.5D, 0.5D),
          |           array(1.0D, 0.0D, 0.0D, 1.0D, 0.5D, 0.5D, -0.5D, 0.5D), 2, 2)) AS a
          |""".stripMargin)
        .collect().head.getDouble(0)
      assert(math.abs(adc) < 1e-12, s"SQL PQ round-trip ADC must be 0, got $adc")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
