package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment for
  * training corpora.
  *
  * `df.sample()`/`sampleBy()` are partitioning-dependent (the RNG seed is
  * per-partition), so the "same" sample changes when the input is
  * repartitioned, compacted, or re-read at a different parallelism — a
  * silent reproducibility bug for dataset splits. Here membership is a pure
  * function of the row's ID: the first 8 hex chars of md5(seed ‖ ':' ‖ id)
  * compared against a hex threshold. Same id ⇒ same verdict, on any
  * engine, any partitioning, any row order — and a doc keeps its split
  * across corpus versions, so train/test contamination cannot creep in
  * when the corpus grows.
  *
  * All column expressions (md5 + substring + string compare) — codegen'd,
  * zero shuffle, scale = scan speed.
  */
object Sampling {

  /** 8-hex-char bucket of (seed, id) — uniform over [0, 2^32). Hex strings
    * compare lexicographically == numerically (fixed width, lowercase).
    */
  def hashBucket(idCol: Column, seed: String = "graft"): Column =
    substring(md5(concat(lit(seed), lit(":"), idCol.cast("string")).cast("binary")), 1, 8)

  /** Hex threshold for a fraction: floor(fraction · 2^32) as 8 hex chars. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    f"${math.floor(fraction * 4294967296.0).toLong.min(0xffffffffL)}%08x"
  }

  /** Keep ~`fraction` of rows, deterministically by id. `fraction = 1.0`
    * short-circuits to no filter (a strict `< ffffffff` compare would drop
    * the ~1-in-4B ids whose bucket is exactly the max — "keep everything"
    * must keep everything).
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      seed: String = "graft"): DataFrame =
    if (fraction >= 1.0) df
    else df.where(hashBucket(col(idCol), seed) < lit(hexThreshold(fraction)))

  /** Assign each row to a named split with the given weights (each > 0,
    * summing to ~1; the last split takes any remainder). E.g.
    * `splitAssign(docs, "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))`.
    */
  def splitAssign(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      seed: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    splits.foreach { case (name, w) =>
      require(w > 0.0, s"split '$name' has non-positive weight $w — it would be silently empty")
    }
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split weights sum to $total > 1")
    val bucket = hashBucket(col(idCol), seed)
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.init.zip(cumulative.init).foldLeft(when(lit(false), "")) {
      case (acc, ((name, _), cum)) => acc.when(bucket < lit(hexThreshold(cum)), name)
    }.otherwise(splits.last._1)
    df.withColumn("split", expr)
  }
}
