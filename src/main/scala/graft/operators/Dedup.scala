package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document deduplication for training-data pipelines: exact (fingerprint
  * hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Portability-by-construction: every hash in this module is derived from
  * md5 over explicit strings, so signatures are bit-identical across engines
  * (the DuckDB oracle recomputes them and hash-matches).
  *
  * Scale notes (100 TB):
  *  - exact dedup is one shuffle on a 32-byte fingerprint, not the document;
  *  - MinHash banding turns all-pairs O(n²) into a join on (band, signature)
  *    buckets — only near-identical docs collide, so the join fan-out is the
  *    candidate-pair count, not n²;
  *  - the Jaccard verifier runs only on candidate pairs.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest id.
    * One shuffle over (16-byte md5) keys; document bodies never shuffle.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(TextFunctions.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word n-gram shingles of the token array; docs shorter than `n` tokens
    * produce an empty array. Delegates to the shared n-gram builder.
    */
  def shingles(toks: Column, n: Int): Column = TextFunctions.ngrams(toks, n)

  /** Per-document distinct shingle table: (id, shingle). */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs.where(size(toks) >= n)
      .select(col(idCol).as("id"), explode(array_distinct(shingles(toks, n))).as("shingle"))
  }

  /** MinHash signatures: k independent hash functions h_i(s) = md5(i ‖ ':' ‖ s);
    * signature[i] = min over the doc's shingles (min over 32-hex-char strings —
    * total order, engine-portable). Output: (id, i, minhash).
    */
  def minhashSignatures(shingled: DataFrame, k: Int = 16): DataFrame =
    shingled
      .select(col("id"), explode(sequence(lit(0), lit(k - 1))).as("i"), col("shingle"))
      .groupBy(col("id"), col("i"))
      .agg(min(md5(concat(col("i").cast("string"), lit(":"), col("shingle")).cast("binary"))).as("minhash"))

  /** LSH bands: group the k signature rows into bands of `rowsPerBand`, and
    * hash each band's ordered minhashes into one band signature.
    * Output: (id, band, band_sig).
    */
  def lshBands(sigs: DataFrame, rowsPerBand: Int = 4): DataFrame =
    sigs.withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("minhash")))),
          x => x.getField("minhash"))).cast("binary")).as("band_sig"))

  /** Candidate near-duplicate pairs: docs sharing at least one LSH band. */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("id").as("id_a"), col("band"), col("band_sig"))
    val b = bands.select(col("id").as("id_b"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs (the verify
    * step after LSH, or a direct all-pairs check on small inputs).
    * `shingled` is a [[shingleTable]]; returns (id_a, id_b, jaccard).
    */
  def jaccardOnPairs(pairs: DataFrame, shingled: DataFrame): DataFrame = {
    val counts = shingled.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = shingled.select(col("id").as("id_a"), col("shingle"))
    val b = shingled.select(col("id").as("id_b"), col("shingle"))
    val common = a.join(b, Seq("shingle")).join(pairs, Seq("id_a", "id_b"), "left_semi")
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    common
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
  }

  /** All-pairs n-gram Jaccard ≥ threshold via a shingle-join (skips LSH;
    * right for the verify path and small-to-medium corpora — the shingle
    * join only materializes pairs that share a shingle).
    */
  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // not cached: the table is cheap to recompute relative to the join, and
    // a library-held cache would leak executor storage across invocations —
    // callers running this repeatedly should persist the shingle table
    // themselves with a lifetime they control
    val sh = shingleTable(docs, idCol, textCol, n)
    val a = sh.select(col("id").as("id_a"), col("shingle"))
    val b = sh.select(col("id").as("id_b"), col("shingle"))
    val common = a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    val counts = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    common
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
