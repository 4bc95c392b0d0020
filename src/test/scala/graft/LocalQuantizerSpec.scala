package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Focused spec for the r14 driver-local quantizer fit
  * (Similarity.fitCentroidsLocal) that replaced the distributed Spark-ML
  * KMeans over the bounded fit sample: the fit must be bit-deterministic
  * (fixed seed init, fixed chunk merge order), clamp k to the sample,
  * keep empty cells' previous centroids, and actually separate separable
  * data — the recall contracts downstream assume co-location, and this
  * spec pins the fit-level invariants they stand on.
  */
class LocalQuantizerSpec extends AnyFunSuite {

  private def blob(center: Array[Double], n: Int, seed: Int): Seq[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(n)(center.map(_ + (rnd.nextDouble() - 0.5) * 0.1))
  }

  test("bit-deterministic across repeated fits of the same sample") {
    val rows = (blob(Array(0.0, 0.0, 0.0), 500, 1) ++
      blob(Array(5.0, 5.0, 5.0), 500, 2)).toArray
    val a = Similarity.fitCentroidsLocal(rows, 8, seed = 42L, iters = 8)
    val b = Similarity.fitCentroidsLocal(rows, 8, seed = 42L, iters = 8)
    assert(a.length == 8 && b.length == 8)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("separates two well-separated blobs (every centroid near one blob)") {
    val rows = (blob(Array(0.0, 0.0, 0.0), 400, 3) ++
      blob(Array(10.0, 10.0, 10.0), 400, 4)).toArray
    val cents = Similarity.fitCentroidsLocal(rows, 2, seed = 42L, iters = 8)
    val sums = cents.map(_.sum).sorted
    assert(sums(0) < 1.0, s"low centroid drifted: ${sums(0)}")
    assert(sums(1) > 29.0, s"high centroid drifted: ${sums(1)}")
  }

  test("k clamps to the sample size; k = n returns the rows themselves") {
    val rows = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(5.0, 5.0))
    val cents = Similarity.fitCentroidsLocal(rows, 10, seed = 7L, iters = 4)
    assert(cents.length == 3)
    // with k = n every row is its own cluster at the fixpoint: the
    // centroid SET equals the row set
    val cset = cents.map(_.toSeq).toSet
    assert(cset == rows.map(_.toSeq).toSet)
  }

  test("empty fit sample refused loudly") {
    val e = intercept[IllegalArgumentException] {
      Similarity.fitCentroidsLocal(Array.empty[Array[Double]], 4, 42L, 8)
    }
    assert(e.getMessage.contains("empty fit sample"))
  }

  test("ragged sample refused loudly") {
    val e = intercept[IllegalArgumentException] {
      Similarity.fitCentroidsLocal(
        Array(Array(1.0, 2.0), Array(1.0)), 2, 42L, 8)
    }
    assert(e.getMessage.contains("ragged fit sample"))
  }

  test("chunk-boundary determinism: > 1 chunk fits equal a single-threaded re-fit") {
    // 20k rows spans 3 chunks of 8192 — the parallel partial-sum merge
    // must produce the same centroids as any other execution of the same
    // chunk structure (ordered merge), so two runs agree bit-for-bit even
    // though the thread schedule differs
    val rnd = new java.util.Random(9)
    val rows = Array.fill(20000)(Array.fill(8)(rnd.nextDouble()))
    val a = Similarity.fitCentroidsLocal(rows, 16, seed = 5L, iters = 6)
    val b = Similarity.fitCentroidsLocal(rows, 16, seed = 5L, iters = 6)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }
}
