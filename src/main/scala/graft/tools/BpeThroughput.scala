package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** Scale-gate tool: REAL-BPE tokenization throughput over the `documents`
  * table — tokens/sec and MB/sec at a given SF, so exact token counting at
  * 100 TB is a MEASURED cost, not an assumed-cheap map (r10 verdict #4).
  * The merge loop's cost scales with how often merges actually fire, so
  * the default vocabulary is a realistic English merge list (common
  * bigram/suffix fusions, ~3 merge rounds on typical words), and a real
  * `merges.txt` (GPT-2-style) can be passed instead.
  *
  * Usage: runMain graft.tools.BpeThroughput <sfDir> [mergesFile|builtin] [runs]
  */
object BpeThroughput {

  /** Deterministic built-in English merge ranking: frequent letter pairs
    * first (they fire on nearly every word), then common fusions built on
    * them — enough rounds per word to exercise the loop like a trained
    * vocabulary does.
    */
  val builtinMerges: Seq[(String, String)] = {
    val pairs = Seq(
      "t h", "h e", "i n", "e r", "a n", "r e", "o n", "a t", "e n", "n d",
      "t i", "e s", "o r", "t e", "o f", "e d", "i s", "i t", "a l", "a r",
      "s t", "t o", "n t", "n g", "s e", "h a", "a s", "o u", "i o", "l e",
      "v e", "c o", "m e", "d e", "h i", "r i", "r o", "i c", "n e", "e a",
      "r a", "c e", "l i", "c h", "l l", "b e", "m a", "s i", "o m", "u r",
      "th e", "in g", "an d", "ti on", "er e", "en t", "he r", "at e",
      "es t", "al l", "or e", "me nt", "it y", "ou r", "ve r", "co m")
    pairs.map { p => val i = p.indexOf(' '); (p.substring(0, i), p.substring(i + 1)) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val mergesArg = if (args.length > 1) args(1) else "builtin"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = if (mergesArg == "builtin") Bpe.BpeVocab(builtinMerges)
      else Bpe.BpeVocab.fromMergesFile(mergesArg,
        spark.sessionState.newHadoopConf())
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select(col("text"))

    def pass(): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val r = docs.agg(
        sum(Bpe.bpe_token_count(col("text"), vocab)).as("tokens"),
        sum(length(col("text")).cast("long")).as("chars")).head()
      ((System.nanoTime() - t0) / 1e9 * 1e9).toLong // force eval first
      (r.getLong(0), r.getLong(1), (System.nanoTime() - t0) / 1e9)
    }
    pass() // warm codegen + page cache
    val results = (1 to runs).map(_ => pass())
    val med = results.sortBy(_._3).apply(results.size / 2)
    val (tokens, chars, sec) = med
    println(f"""BPE {"sf":"$sfDir","vocab":"$mergesArg","merges":${vocab.size},""" +
      f""""docs":${docs.count()},"tokens":$tokens,"chars":$chars,""" +
      f""""wall_s":$sec%.2f,"tokens_per_s":${(tokens / sec).toLong},""" +
      f""""mb_per_s":${chars / sec / 1e6}%.1f,""" +
      f""""runs":[${results.map(r => f"${r._3}%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
