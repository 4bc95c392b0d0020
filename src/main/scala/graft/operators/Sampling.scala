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

  /** Data-mixing (stratified deterministic sampling): keep a different
    * fraction of each stratum — the "50% web, all of books, 10% of logs"
    * recipe every training-data pipeline ends in. Strata not named in
    * `fractions` keep `defaultFraction`. Membership stays a pure function
    * of (seed, id): re-mixing with a changed recipe keeps every previously
    * kept row whose stratum fraction did not shrink — no reshuffle churn.
    * Pure column expressions: codegen'd, zero shuffle, scale = scan speed.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: String = "graft"): DataFrame = {
    fractions.foreach { case (k, f) =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f for stratum '$k' out of [0,1]")
    }
    // fraction 1.0 maps to the sentinel threshold "g": buckets are 8 hex
    // chars (0-9a-f), all lexicographically < "g", so an all-kept stratum
    // keeps even the ~1-in-4B ids whose bucket is exactly ffffffff (a
    // strict compare against a hex threshold could not express that)
    def thrFor(f: Double) = if (f >= 1.0) "g" else hexThreshold(f)
    val thr = fractions.foldLeft(when(lit(false), "")) { case (acc, (k, f)) =>
      acc.when(col(strataCol) === k, thrFor(f))
    }.otherwise(thrFor(defaultFraction))
    df.where(hashBucket(col(idCol), seed) < thr)
  }

  /** Token-budget packing: fill each stratum's budget in deterministic id
    * order and cut off once the running total would pass it — "1B tokens
    * per domain" as a dataframe program. One hash-shuffle + sort per
    * stratum (the window); rows carry their cumulative total out for
    * auditability. The rule is the simple prefix cut (cum ≤ budget), not
    * bin-packing: the running total is monotone, so the kept set is
    * exactly the longest id-ordered prefix that fits — reproducible and
    * order-stable as the corpus grows, which best-fit packing is not.
    */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
      strataCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_weight", sum(col(weightCol)).over(w))
      .where(col("cum_weight") <= budget)
  }

  /** Deterministic per-epoch training-order shuffle: the permutation is a
    * pure function of (seed, epoch, id) — every epoch reads the corpus in
    * a different pseudorandom order, every re-run of the same epoch reads
    * the SAME order, on any partitioning (the reproducibility property
    * `orderBy(rand(seed))` lacks, for the same reason as [[hashBucket]]).
    * The sort is Spark's distributed range sort — no global window, no
    * single-point rank assignment; writing the result sorted IS the
    * shuffled training order. Ties cannot occur (full md5 + id tiebreak).
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      seed: String = "graft"): DataFrame =
    df.withColumn("shuffle_key",
      md5(concat(lit(seed), lit(":"), lit(epoch.toString), lit(":"),
        col(idCol).cast("string")).cast("binary")))
      .orderBy(col("shuffle_key"), col(idCol))

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
