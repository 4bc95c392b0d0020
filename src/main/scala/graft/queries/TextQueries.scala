package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, SimHash}
import graft.queries.Registry.tbl

/** Training-data text operators over `documents`: stats/quality/language-ID/
  * token counting, exact dedup, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Near-dup queries plant mutated copies of the first docs (id + 10⁹,
  * text ‖ " extra words...") so the pair-finding path is exercised with a
  * known non-empty answer — the same planting is mirrored in the oracle SQL.
  * The offset sits far above any test corpus's id range: the first sf3 gate
  * caught planted ids at +100000 COLLIDING with real documents once the
  * corpus passed 100k rows — DuckDB's GROUP BY doc_id then merged a planted
  * doc's shingles with an unrelated real doc's, while the map-side
  * per-document signatures kept them separate, so q34 jaccard values and
  * q35/q36 row counts silently diverged at 30× even though both engines
  * were internally consistent.
  */
object TextQueries {

  /** documents ∪ planted near-duplicate mutations of docs 0..49 ∪ planted
    * exact copies of docs 0..19 (so both dedup branches have real work).
    */
  private[queries] def withPlanted(s: SparkSession, d: String): DataFrame = {
    val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          concat(col("text"), lit(" graft extra trailing words")).as("text")))
      .unionByName(
        docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 2000000000L).as("doc_id"), col("text")))
  }

  private[queries] val plantedSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000000 AS doc_id, text || ' graft extra trailing words' AS text
      |FROM documents WHERE doc_id < 50
      |UNION ALL
      |SELECT doc_id + 2000000000 AS doc_id, text FROM documents WHERE doc_id < 20""".stripMargin

  /** Token list SQL (mirror of TextFunctions.tokens). */
  private[queries] val toksSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** Oracle mirrors of TextFunctions.qualityScore and langId (DuckDB SQL). */
  private[queries] val qualitySql =
    s"""(0.4 * least(1.0, CAST(length(text) AS DOUBLE) / 500.0)
       | + 0.3 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
       |     ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / length(text) END))
       | + 0.3 * least(1.0, (CASE WHEN len($toksSql) = 0 THEN 0.0
       |     ELSE CAST(len(list_filter($toksSql, t -> list_contains(['the','and','of','to','a','in','is','it'], t))) AS DOUBLE)
       |          / len($toksSql) END) * 4.0))""".stripMargin
  private[queries] val langIdSql =
    s"""(CASE
       |   WHEN text IS NULL THEN 'und'
       |   WHEN len(list_filter($toksSql, t -> list_contains(['the','and','of','to','a','in','is','it'], t))) = 0
       |    AND len(list_filter($toksSql, t -> list_contains(['el','la','de','que','y','los','en','un'], t))) = 0
       |    AND len(list_filter($toksSql, t -> list_contains(['der','die','und','das','ist','ein','nicht','mit'], t))) = 0
       |    AND len(list_filter($toksSql, t -> list_contains(['le','la','et','les','des','un','une','est'], t))) = 0 THEN 'und'
       |   WHEN len(list_filter($toksSql, t -> list_contains(['the','and','of','to','a','in','is','it'], t))) >= len(list_filter($toksSql, t -> list_contains(['el','la','de','que','y','los','en','un'], t)))
       |    AND len(list_filter($toksSql, t -> list_contains(['the','and','of','to','a','in','is','it'], t))) >= len(list_filter($toksSql, t -> list_contains(['der','die','und','das','ist','ein','nicht','mit'], t)))
       |    AND len(list_filter($toksSql, t -> list_contains(['the','and','of','to','a','in','is','it'], t))) >= len(list_filter($toksSql, t -> list_contains(['le','la','et','les','des','un','une','est'], t))) THEN 'en'
       |   WHEN len(list_filter($toksSql, t -> list_contains(['el','la','de','que','y','los','en','un'], t))) >= len(list_filter($toksSql, t -> list_contains(['der','die','und','das','ist','ein','nicht','mit'], t)))
       |    AND len(list_filter($toksSql, t -> list_contains(['el','la','de','que','y','los','en','un'], t))) >= len(list_filter($toksSql, t -> list_contains(['le','la','et','les','des','un','une','est'], t))) THEN 'es'
       |   WHEN len(list_filter($toksSql, t -> list_contains(['der','die','und','das','ist','ein','nicht','mit'], t))) >= len(list_filter($toksSql, t -> list_contains(['le','la','et','les','des','un','une','est'], t))) THEN 'de'
       |   ELSE 'fr' END)""".stripMargin

  /** Oracle for the corpus pipeline (q47 exact mode and q108 capped
    * mode share it: at oracle SFs no LSH bucket approaches the cap, so
    * both modes produce identical verdict summaries). */
  private[queries] lazy val corpusPipelineOracle =
    s"""WITH docs AS ($plantedSql),
       |base AS (SELECT doc_id, text, ROUND($qualitySql, 4) AS quality,
       |  $langIdSql AS lang_pred, len($toksSql) AS n_tokens,
       |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM docs),
       |we AS (SELECT base.*, doc_id <> MIN(doc_id) OVER (PARTITION BY fp) AS exact_dup FROM base),
       |survivors AS (SELECT doc_id, text FROM we WHERE NOT exact_dup),
       |toks AS (SELECT doc_id, $toksSql AS t FROM survivors WHERE len($toksSql) >= 3),
       |sh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] AS shingle
       |       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(x)),
       |sig AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS minhash
       |        FROM sh, UNNEST(generate_series(0, 15)) AS g(i)
       |        GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // 2 AS band, md5(string_agg(minhash, ',' ORDER BY i)) AS band_sig
       |          FROM sig GROUP BY doc_id, band),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
       |         WHERE a.doc_id < b.doc_id),
       |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
       |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |           JOIN cand ON cand.id_a = a.doc_id AND cand.id_b = b.doc_id
       |           GROUP BY 1, 2),
       |near AS (SELECT DISTINCT id_b AS doc_id FROM common
       |         JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b
       |         WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5),
       |verdicts AS (SELECT we.quality,
       |  CASE WHEN quality < 0.5 THEN 'low_quality'
       |       WHEN n_tokens < 5 THEN 'too_short'
       |       WHEN lang_pred <> 'en' THEN 'wrong_lang'
       |       WHEN exact_dup THEN 'exact_dup'
       |       WHEN near.doc_id IS NOT NULL THEN 'near_dup'
       |       ELSE 'kept' END AS verdict
       |  FROM we LEFT JOIN near ON we.doc_id = near.doc_id)
       |SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n,
       |  ROUND(AVG(quality), 4) AS avg_quality
       |FROM verdicts GROUP BY verdict ORDER BY verdict""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- per-document stats: chars, tokens, bpe-ish tokens, punct ratio
    Q("q30_text_stats", (s, d) =>
      tbl(s, d, "documents").select(
        col("doc_id"),
        TextFunctions.charCount(col("text")).as("chars"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        round(TextFunctions.punctRatio(col("text")), 4).as("punct_ratio"),
        round(TextFunctions.stopwordRatio(col("text"), TextFunctions.StopwordsEn), 4)
          .as("stop_ratio"))
        .orderBy(col("doc_id")),
      Some(
        s"""SELECT doc_id,
           | CAST(length(text) AS BIGINT) AS chars,
           | CAST(len($toksSql) AS BIGINT) AS n_tokens,
           | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
           | ROUND(CASE WHEN length(text) = 0 THEN 0.0
           |   ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / length(text) END, 4) AS punct_ratio,
           | ROUND(CASE WHEN len($toksSql) = 0 THEN 0.0
           |   ELSE CAST(len(list_filter($toksSql, t -> list_contains(['the','and','of','to','a','in','is','it'], t))) AS DOUBLE)
           |        / len($toksSql) END, 4) AS stop_ratio
           |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- quality scoring
    Q("q31_quality_score", (s, d) =>
      tbl(s, d, "documents").select(
        col("doc_id"),
        round(TextFunctions.qualityScore(col("text")), 4).as("quality"))
        .orderBy(col("doc_id")),
      Some(
        s"""SELECT doc_id, ROUND(
           |   0.4 * least(1.0, CAST(length(text) AS DOUBLE) / 500.0)
           | + 0.3 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
           |     ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / length(text) END))
           | + 0.3 * least(1.0, (CASE WHEN len($toksSql) = 0 THEN 0.0
           |     ELSE CAST(len(list_filter($toksSql, t -> list_contains(['the','and','of','to','a','in','is','it'], t))) AS DOUBLE)
           |          / len($toksSql) END) * 4.0), 4) AS quality
           |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- language-ID heuristic (argmax of function-word hits)
    Q("q32_lang_id", (s, d) =>
      tbl(s, d, "documents").select(
        col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred")),
      Some(
        s"""WITH scored AS (SELECT doc_id,
           |  len(list_filter($toksSql, t -> list_contains(['the','and','of','to','a','in','is','it'], t))) AS c_en,
           |  len(list_filter($toksSql, t -> list_contains(['el','la','de','que','y','los','en','un'], t))) AS c_es,
           |  len(list_filter($toksSql, t -> list_contains(['der','die','und','das','ist','ein','nicht','mit'], t))) AS c_de,
           |  len(list_filter($toksSql, t -> list_contains(['le','la','et','les','des','un','une','est'], t))) AS c_fr
           | FROM documents)
           |SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n FROM (
           | SELECT CASE
           |   WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'und'
           |   WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
           |   WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
           |   WHEN c_de >= c_fr THEN 'de'
           |   ELSE 'fr' END AS lang_pred
           | FROM scored) t GROUP BY lang_pred ORDER BY lang_pred""".stripMargin)),

    // ---- content fingerprint + exact dedup over planted corpus
    Q("q33_exact_dedup", (s, d) =>
      Dedup.exact(withPlanted(s, d), "doc_id", "text")
        .orderBy(col("fp")),
      Some(
        s"""SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           | CAST(MIN(doc_id) AS BIGINT) AS keep_id, CAST(COUNT(*) AS BIGINT) AS dup_count
           |FROM ($plantedSql) docs
           |GROUP BY fp ORDER BY fp""".stripMargin),
      bench = true),

    // ---- n-gram Jaccard near-dup pairs over planted corpus
    Q("q34_jaccard_near_dups", (s, d) =>
      Dedup.jaccardNearDups(withPlanted(s, d), "doc_id", "text", n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b")),
      Some(
        s"""WITH docs AS ($plantedSql),
           |toks AS (SELECT doc_id, $toksSql AS t FROM docs WHERE len($toksSql) >= 3),
           |sh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] AS shingle
           |       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(x)),
           |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
           |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
           |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |           GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  ROUND(CAST(common AS DOUBLE) / (ca.n + cb.n - common), 4) AS jaccard
           |FROM common JOIN counts ca ON ca.doc_id = id_a
           |            JOIN counts cb ON cb.doc_id = id_b
           |WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5
           |ORDER BY id_a, id_b""".stripMargin)),

    // ---- MinHash signatures + LSH bands (signature math oracle-checked)
    Q("q35_minhash_bands", (s, d) =>
      Dedup.minhashBandsNarrow(
        Dedup.shingleArrays(withPlanted(s, d), "doc_id", "text", n = 3), k = 16, rowsPerBand = 4)
        .select(col("id").as("doc_id"), col("band"), col("band_sig"))
        .orderBy(col("doc_id"), col("band")),
      Some(
        s"""WITH docs AS ($plantedSql),
           |toks AS (SELECT doc_id, $toksSql AS t FROM docs WHERE len($toksSql) >= 3),
           |sh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] AS shingle
           |       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(x)),
           |sig AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS minhash
           |        FROM sh, UNNEST(generate_series(0, 15)) AS g(i)
           |        GROUP BY doc_id, i)
           |SELECT doc_id, CAST(i // 4 AS INT) AS band,
           |  md5(string_agg(minhash, ',' ORDER BY i)) AS band_sig
           |FROM sig GROUP BY doc_id, band ORDER BY doc_id, band""".stripMargin)),

    // ---- LSH candidate pairs (the actual near-dup join over bands)
    Q("q36_minhash_lsh_pairs", (s, d) =>
      Dedup.lshCandidates(Dedup.minhashBandsNarrow(
        Dedup.shingleArrays(withPlanted(s, d), "doc_id", "text", n = 3), k = 16, rowsPerBand = 4))
        .orderBy(col("id_a"), col("id_b")),
      Some(
        s"""WITH docs AS ($plantedSql),
           |toks AS (SELECT doc_id, $toksSql AS t FROM docs WHERE len($toksSql) >= 3),
           |sh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] AS shingle
           |       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(x)),
           |sig AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS minhash
           |        FROM sh, UNNEST(generate_series(0, 15)) AS g(i)
           |        GROUP BY doc_id, i),
           |bands AS (SELECT doc_id, i // 4 AS band, md5(string_agg(minhash, ',' ORDER BY i)) AS band_sig
           |          FROM sig GROUP BY doc_id, band)
           |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
           |WHERE a.doc_id < b.doc_id ORDER BY id_a, id_b""".stripMargin)),

    // ---- SimHash fingerprints + hamming distance on planted pairs
    Q("q37_simhash", (s, d) => {
      val planted = withPlanted(s, d)
      val fps = SimHash.fingerprints(planted, "doc_id", "text")
      val bits = SimHash.fingerprintBits(planted, "doc_id", "text")
      val pairs = tbl(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000000L).as("id_b"))
      SimHash.hammingOnPairs(pairs, bits)
        .join(fps.withColumnRenamed("id", "id_a").withColumnRenamed("simhash", "simhash_a"), Seq("id_a"))
        .select(col("id_a"), col("id_b"), col("simhash_a"), col("hamming"))
        .orderBy(col("id_a"))
    }, Some(
      s"""WITH docs AS ($plantedSql),
         |toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM docs),
         |bits AS (SELECT doc_id, bitpos,
         |   CAST(floor(
         |     (strpos('0123456789abcdef', substr(substr(md5(tok), 1, 8), CAST(8 - floor(bitpos / 4) AS INT), 1)) - 1)
         |     / (CASE bitpos % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)
         |   ) AS BIGINT) % 2 AS bit
         | FROM toks, UNNEST(generate_series(0, 31)) AS g(bitpos)),
         |votes AS (SELECT doc_id, bitpos, SUM(bit * 2 - 1) AS vote FROM bits GROUP BY doc_id, bitpos),
         |fp AS (SELECT doc_id, bitpos, CASE WHEN vote > 0 THEN 1 ELSE 0 END AS simbit FROM votes),
         |hashes AS (SELECT doc_id, CAST(SUM(CAST(simbit AS DOUBLE) * power(2.0, bitpos)) AS BIGINT) AS simhash
         |           FROM fp GROUP BY doc_id)
         |SELECT a.doc_id AS id_a, a.doc_id + 1000000000 AS id_b, ha.simhash AS simhash_a,
         |  CAST(SUM(CASE WHEN fa.simbit <> fb.simbit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
         |FROM (SELECT doc_id FROM documents WHERE doc_id < 50) a
         |JOIN fp fa ON fa.doc_id = a.doc_id
         |JOIN fp fb ON fb.doc_id = a.doc_id + 1000000000 AND fb.bitpos = fa.bitpos
         |JOIN hashes ha ON ha.doc_id = a.doc_id
         |GROUP BY a.doc_id, ha.simhash ORDER BY id_a""".stripMargin)),

    // ---- rolling-hash document fingerprint via the native FNV-1a codegen
    // expression. FNV values aren't oracle-expressible (pinned to published
    // vectors in FnvHashSpec); the oracle-checked CONTRACT is the grouping
    // itself: hashing must partition documents exactly like grouping by the
    // normalized text (which the oracle CAN compute) — per-group (keep_id,
    // n) hash-matches, so a collision or a normalization drift fails loudly.
    Q("q39_fnv_fingerprint", (s, d) => {
      graft.functions.FnvHash64.register(s)
      tbl(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.FnvHash64.fnv_hash64(
            graft.functions.TextFunctions.normalizedText(col("text"))).as("fp64"))
        .groupBy(col("fp64")).agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .select(col("keep_id"), col("n"))
        .orderBy(col("keep_id"))
    }, Some(
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        |      FROM documents)
        |GROUP BY nt ORDER BY keep_id""".stripMargin)),

    // ---- multimodal frame sampling: fixed-size byte frames from the opaque
    // payload (the shape of video frame-extraction plumbing; the "decode" is
    // a deterministic stub per the offline container contract)
    Q("q45_multimodal_frames", (s, d) =>
      tbl(s, d, "documents")
        // length > 0 guard: (0-1)/32 truncates to 0 here but floors to -1 in
        // the oracle; frames are char-indexed on both sides (byte == char
        // for this ASCII corpus; binary payloads would frame on bytes)
        .filter(col("doc_id") < 100 && length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), ((length(col("text")) - 1) / 32).cast("int"))).as("frame_no"))
        .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
          md5(col("text").substr(col("frame_no") * 32 + 1, lit(32)).cast("binary")).as("frame_md5"))
        .orderBy(col("doc_id"), col("frame_no")),
      Some(
        """SELECT doc_id, g.x AS frame_no,
          | md5(substr(text, CAST(g.x * 32 + 1 AS INT), 32)) AS frame_md5
          |FROM documents, UNNEST(generate_series(0, (length(text) - 1) // 32)) AS g(x)
          |WHERE doc_id < 100 AND length(text) > 0
          |ORDER BY doc_id, frame_no""".stripMargin)),

    // ---- repetition ratio (boilerplate/spam signal): repeated-trigram
    // fraction per doc; repetitive docs planted by repeating the first
    // 10 tokens 10 times
    Q("q48_repetition_ratio", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val repeaty = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000000L).as("doc_id"),
          concat_ws(" ", flatten(array_repeat(
            slice(graft.functions.TextFunctions.tokens(col("text")), 1, 10), 10))).as("text"))
      docs.unionByName(repeaty)
        .select(col("doc_id"),
          round(graft.functions.TextFunctions.repetitionRatio(col("text")), 4).as("rep_ratio"))
        .where(col("rep_ratio") > 0.05)
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 3000000000 AS doc_id,
         |    array_to_string(flatten([list_slice($toksSql, 1, 10) FOR i IN generate_series(1, 10)]), ' ') AS text
         |  FROM documents WHERE doc_id < 10),
         |grams AS (SELECT doc_id, len($toksSql) AS n,
         |  [t[x] || ' ' || t[x+1] || ' ' || t[x+2]
         |   FOR x IN generate_series(1, len($toksSql) - 2)] AS g
         |  FROM (SELECT doc_id, text, $toksSql AS t FROM docs) sub)
         |SELECT doc_id, rep_ratio FROM (
         |  SELECT doc_id, ROUND(CASE WHEN n < 3 THEN 0.0
         |    ELSE 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g) END, 4) AS rep_ratio
         |  FROM grams) t
         |WHERE rep_ratio > 0.05 ORDER BY doc_id""".stripMargin)),

    // ---- corpus-level token statistics (corpus token counting)
    Q("q49_corpus_stats", (s, d) => {
      val docs = tbl(s, d, "documents")
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val perDoc = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      val vocab = docs.select(explode(toks).as("tok")).agg(countDistinct(col("tok")).as("v")).
        select(col("v"))
      perDoc.agg(
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        round(expr("percentile(n_tokens, 0.5)"), 4).as("p50_tokens"),
        round(expr("percentile(n_tokens, 0.9)"), 4).as("p90_tokens"),
        count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(vocab.withColumnRenamed("v", "vocab_size")))
    }, Some(
      s"""SELECT
         | CAST(SUM(len($toksSql)) AS BIGINT) AS total_tokens,
         | CAST(SUM(length(text)) AS BIGINT) AS total_chars,
         | ROUND(quantile_cont(len($toksSql), 0.5), 4) AS p50_tokens,
         | ROUND(quantile_cont(len($toksSql), 0.9), 4) AS p90_tokens,
         | CAST(COUNT(*) AS BIGINT) AS n_docs,
         | (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
         |  FROM (SELECT unnest($toksSql) AS tok FROM documents) u) AS vocab_size
         |FROM documents""".stripMargin)),

    // ---- REAL media decode round-trip (r10): encode → decode → verify,
    // as a machine-checked contract (the q44 pattern — pixel/PCM decode is
    // not SQL-expressible, but the ROUND-TRIP invariants are booleans
    // DuckDB can pin): per doc, a deterministically-sized gradient PNG and
    // a half-silence WAV are generated in-executor, decoded by the REAL
    // JDK decoders (ImageIoDecoder / JavaSoundDecoder), and checked —
    // decoded dims == generated dims, luma grid monotone along the
    // gradient, audio rate/channels exact, RMS envelope silent-then-loud.
    // The pipeline is the production shape: per-partition batched decode,
    // no shuffle (PlanSpec-style narrowness is pinned in MultimodalSpec).
    Q("q112_media_decode", (s, d) => {
      import s.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.MediaRecord
      val ids = tbl(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 50)
        .as[Long]
      val png = ids.map { id =>
        val w = 16 + (id % 32).toInt; val h = 16 + (id % 24).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = if (w == 1) 0 else x * 255 / (w - 1)
            img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        MediaRecord(id, baos.toByteArray, "image/png")
      }
      val wav = ids.map { id =>
        val rate = 8000; val n = 800 + (id % 8).toInt * 100
        val data = new Array[Byte](n * 2)
        var i = n / 2
        while (i < n) { // second half: full-scale square wave
          val v: Short = if ((i / 8) % 2 == 0) 16384 else -16384
          data(i * 2) = (v & 0xff).toByte
          data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        MediaRecord(id, baos.toByteArray, "audio/wav")
      }
      val imgOk = Multimodal.extractFeatures(png, new Multimodal.ImageIoDecoder(4))(s)
        .map { f =>
          val dimsOk = f.width == 16 + (f.doc_id % 32).toInt &&
            f.height == 16 + (f.doc_id % 24).toInt
          // horizontal gradient: each grid column brighter than the last
          val gradOk = (0 until 4).forall(r => (0 until 3).forall(c =>
            f.feature(r * 4 + c) < f.feature(r * 4 + c + 1)))
          (f.doc_id, dimsOk, gradOk)
        }.toDF("doc_id", "dims_ok", "grad_ok")
      val audOk = Multimodal.extractFeatures(wav, new Multimodal.JavaSoundDecoder(4))(s)
        .map { f =>
          val fmtOk = f.width == 8000 && f.height == 1
          // first half silent, second half ~0.5 RMS
          val envOk = f.feature(0) == 0.0f && f.feature(1) == 0.0f &&
            math.abs(f.feature(2) - 0.5f) < 0.02f &&
            math.abs(f.feature(3) - 0.5f) < 0.02f
          (f.doc_id, fmtOk, envOk)
        }.toDF("doc_id", "fmt_ok", "env_ok")
      imgOk.join(audOk, "doc_id").agg(
        count(lit(1)).as("n_docs"),
        (sum(when(col("dims_ok") && col("grad_ok"), 0).otherwise(1)) === 0).as("image_ok"),
        (sum(when(col("fmt_ok") && col("env_ok"), 0).otherwise(1)) === 0).as("audio_ok"))
    }, Some(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        | TRUE AS image_ok, TRUE AS audio_ok
        |FROM documents WHERE doc_id < 50""".stripMargin)),

    // ---- REAL BPE token counting (r10): the merge loop over a
    // caller-supplied merges table, as a machine-checked contract (the
    // q44 pattern — BPE is not SQL-expressible, but its BRACKET is):
    // exact BPE count shares bpeTokenCount's pre-tokenization, so per doc
    // approx ≤ exact ≤ pre-token char count, with strict overall
    // reduction when the vocab's merges fire; BpeSpec pins the
    // hand-computed tokenizations themselves. The vocab broadcasts inside
    // the expression (narrow codegen scalar, no join/UDF) — the 100 TB
    // shape for token-budget packing and corpus stats.
    Q("q111_bpe_token_count", (s, d) => {
      import graft.functions.Bpe
      val vocab = Bpe.BpeVocab(Seq(("l", "o"), ("lo", "w"), ("e", "r"),
        ("t", "h"), ("th", "e"), ("i", "n")))
      val counted = tbl(s, d, "documents").select(
        graft.functions.TextFunctions.bpeTokenCount(col("text")).as("approx"),
        Bpe.bpe_token_count(col("text"), vocab).as("exact"),
        Bpe.bpe_token_count(col("text"), Bpe.BpeVocab(Nil)).as("chars"))
      counted.agg(
        count(lit(1)).as("n_docs"),
        (sum(when(col("approx") <= col("exact") && col("exact") <= col("chars"), 0)
          .otherwise(1)) === 0).as("bounds_ok"),
        (sum(col("exact")) < sum(col("chars"))).as("merges_reduce"))
    }, Some(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        | TRUE AS bounds_ok, TRUE AS merges_reduce
        |FROM documents""".stripMargin)),

    // ---- REAL video decode round-trip (r11, q112's pattern on the video
    // modality): per doc, a deterministic MJPEG-AVI — frames of strictly
    // increasing brightness — is containerized in-executor (MjpegAvi
    // container writer over ImageIO JPEG frames), decoded by the REAL
    // MjpegAviDecoder (RIFF parse → deterministic frame sampling → ImageIO
    // per frame → shared luma grid), and checked: first-frame dims exact,
    // feature layout = sampleFrames × grid², and the TEMPORAL gradient
    // (each sampled frame's mean luma brighter than the previous) — which
    // only holds if sampling picked the right frames in stream order.
    // Compressed inter-frame codecs stay refused loudly (MjpegAviSpec);
    // MJPEG is all I-frames, which is exactly why it is JDK-decodable.
    Q("q115_video_decode", (s, d) => {
      import s.implicits._
      import graft.operators.{MjpegAvi, Multimodal}
      import graft.operators.Multimodal.MediaRecord
      val ids = tbl(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 50)
        .as[Long]
      val avi = ids.map { id =>
        val w = 16 + (id % 16).toInt * 2; val h = 16 + (id % 12).toInt * 2
        val nFrames = 6 + (id % 5).toInt
        val frames = (0 until nFrames).map { fi =>
          val v = 20 + fi * 200 / nFrames // strictly increasing gray level
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = img.createGraphics()
          try { g2.setColor(new java.awt.Color(v, v, v)); g2.fillRect(0, 0, w, h) }
          finally g2.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", baos)
          baos.toByteArray
        }
        MediaRecord(id, MjpegAvi.encode(frames, w, h), "video/avi")
      }
      val checked = Multimodal.extractFeatures(avi,
          new Multimodal.MjpegAviDecoder(gridSize = 4, sampleFrames = 4))(s)
        .map { f =>
          val dimsOk = f.width == 16 + (f.doc_id % 16).toInt * 2 &&
            f.height == 16 + (f.doc_id % 12).toInt * 2
          val layoutOk = f.feature.length == 4 * 16
          // temporal gradient: each sampled frame's MEAN luma must exceed
          // the previous frame's — stream-order sampling made visible
          val means = (0 until 4).map(sl =>
            f.feature.slice(sl * 16, sl * 16 + 16).sum / 16.0)
          val gradOk = (0 until 3).forall(i => means(i) < means(i + 1))
          (f.doc_id, dimsOk, layoutOk, gradOk)
        }.toDF("doc_id", "dims_ok", "layout_ok", "grad_ok")
      checked.agg(
        count(lit(1)).as("n_docs"),
        (sum(when(col("dims_ok"), 0).otherwise(1)) === 0).as("dims_ok"),
        (sum(when(col("layout_ok"), 0).otherwise(1)) === 0).as("layout_ok"),
        (sum(when(col("grad_ok"), 0).otherwise(1)) === 0).as("temporal_ok"))
    }, Some(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        | TRUE AS dims_ok, TRUE AS layout_ok, TRUE AS temporal_ok
        |FROM documents WHERE doc_id < 50""".stripMargin)),

    // ---- the composed training-data cleaning pipeline: quality gate →
    // exact dedup → LSH+Jaccard near-dup removal → language filter, with a
    // per-verdict audit — the end-to-end use case of the extension ops
    Q("q47_corpus_pipeline", (s, d) =>
      graft.operators.CorpusPipeline.auditSummary(
        graft.operators.CorpusPipeline.annotate(withPlanted(s, d),
          // pin the shingle/signature width to the machine: AQE's
          // bytes-based coalescing folds this small corpus onto 3-4 tasks
          // and serializes the CPU-bound md5/ngram stages (measured 2×)
          graft.operators.CorpusPipeline.Config(
            parallelism = Some(s.sparkContext.defaultParallelism)))),
      Some(corpusPipelineOracle), bench = true),

    // ---- the SAME pipeline in its production shape: LSH buckets larger
    // than 64 docs are skipped before the pair join (template-spam guard —
    // a family of moderately-similar boilerplate collapses into shared
    // buckets and the within-bucket join goes quadratic in family size;
    // the scaled instances reproduce this with cross-replica siblings at
    // J≈0.25, measured 39× shuffle per data decade uncapped). At oracle
    // SFs no bucket approaches the cap, so the answer — and the oracle —
    // is IDENTICAL to q47's exact mode; at sf10 the cap restores linear
    // cost. Benched so the two modes' divergence is visible per round.
    Q("q108_corpus_pipeline_capped", (s, d) =>
      graft.operators.CorpusPipeline.auditSummary(
        graft.operators.CorpusPipeline.annotate(withPlanted(s, d),
          graft.operators.CorpusPipeline.Config.production(
            parallelism = Some(s.sparkContext.defaultParallelism)))),
      Some(corpusPipelineOracle), bench = true),

    // ---- deterministic train/val/test split assignment: membership is a
    // pure function of the doc id (md5 bucket vs hex threshold), so the
    // split survives repartitioning, corpus growth, and engine changes —
    // df.sample()'s per-partition RNG does not. Oracle recomputes the
    // identical buckets.
    Q("q60_dataset_splits", (s, d) =>
      graft.operators.Sampling.splitAssign(tbl(s, d, "documents"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("split")),
      Some {
        val t90 = graft.operators.Sampling.hexThreshold(0.9)
        val t95 = graft.operators.Sampling.hexThreshold(0.95)
        s"""WITH b AS (SELECT doc_id,
           |  substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8) AS bucket
           |  FROM documents)
           |SELECT CASE WHEN bucket < '$t90' THEN 'train'
           |            WHEN bucket < '$t95' THEN 'val'
           |            ELSE 'test' END AS split,
           | CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
           |FROM b GROUP BY split ORDER BY split""".stripMargin
      }),

    // ---- deterministic per-epoch training-order shuffle: two epochs of
    // the same corpus emit DIFFERENT pseudorandom orders, each a pure
    // function of (seed, epoch, id) — reproducible on any partitioning,
    // unlike orderBy(rand(seed)). The row ORDER itself is what the oracle
    // hash-checks (both sides sort by the same md5 keys); the Spark side
    // is a distributed range sort, no global rank window.
    Q("q85_epoch_shuffle", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"))
      (0 to 1).map { e =>
        graft.operators.Sampling.epochShuffle(docs, "doc_id", e)
          .select(lit(e).as("epoch"), col("shuffle_key"), col("doc_id"))
      }.reduce(_ unionByName _)
        .orderBy(col("epoch"), col("shuffle_key"), col("doc_id"))
    }, Some(
      """SELECT epoch, md5('graft:' || CAST(epoch AS VARCHAR) || ':'
        |    || CAST(doc_id AS VARCHAR)) AS shuffle_key, doc_id
        |FROM documents, (VALUES (0), (1)) e(epoch)
        |ORDER BY epoch, shuffle_key, doc_id""".stripMargin)),

    // ---- bottom-decile quality filtering: the corpus-cleaning gate that
    // drops the worst 10% by quality score; exact interpolated percentile
    // (q13's parity pattern)
    Q("q61_quality_decile_filter", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"),
        round(TextFunctions.qualityScore(col("text")), 4).as("quality"))
      val thr = docs.agg(expr("percentile(quality, 0.1)").as("thr"))
      docs.crossJoin(broadcast(thr))
        .groupBy((col("quality") >= col("thr")).as("kept"))
        .agg(count(lit(1)).as("n"), round(avg(col("quality")), 4).as("avg_q"))
        .orderBy(col("kept"))
    }, Some(
      s"""WITH q AS (SELECT doc_id, ROUND($qualitySql, 4) AS quality FROM documents),
         |t AS (SELECT percentile_cont(0.1) WITHIN GROUP (ORDER BY quality) AS thr FROM q)
         |SELECT quality >= thr AS kept, CAST(COUNT(*) AS BIGINT) AS n,
         |  ROUND(AVG(quality), 4) AS avg_q
         |FROM q, t GROUP BY kept ORDER BY kept""".stripMargin)),

    // ---- multimodal plumbing: opaque binary payload + typed metadata +
    // deterministic "decode" stub (SURVEY.md §7.1(10)); the binary column
    // stands in for image/audio bytes, features are engine-portable
    Q("q38_multimodal_payload", (s, d) =>
      tbl(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          struct(lit("text/plain").as("mime"), col("source").as("origin")).as("meta"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          lower(hex(substring(col("payload"), 1, 8))).as("head_hex"),
          col("meta.mime").as("mime"), col("meta.origin").as("origin"))
        .orderBy(col("doc_id")),
      Some(
        """SELECT doc_id,
          | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          | md5(text) AS payload_md5,
          | lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
          | 'text/plain' AS mime, source AS origin
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- incremental dedup: a NEW batch classified against the existing
    // corpus (fingerprint index for exact; LSH band index for near) — the
    // continuously-fed-corpus shape, where re-deduplicating the whole lake
    // per incoming batch is not an option. Plants guarantee every verdict
    // and a non-empty near answer at any sf. Bounded id ranges keep the
    // query sf-independent.
    Q("q63_incremental_dedup", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.where(col("doc_id") < 300)
      val incoming = docs.where(col("doc_id") >= 300 && col("doc_id") < 450)
        .unionByName(docs.where(col("doc_id") < 10) // exact copies → known_dup
          .select((col("doc_id") + 5000000000L).as("doc_id"), col("text")))
        .unionByName(docs.where(col("doc_id") >= 10 && col("doc_id") < 20)
          .select((col("doc_id") + 6000000000L).as("doc_id"), // near variants → near pairs
            concat(col("text"), lit(" incremental near variant")).as("text")))
        .unionByName(docs.where(col("doc_id") === 300) // in-batch duplicate → batch_dup
          .select((col("doc_id") + 7000000000L).as("doc_id"), col("text")))
      val exact = Dedup.incrementalExact(incoming, "doc_id", "text",
        corpus.select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp")))
      val near = Dedup.incrementalNearDups(
        Dedup.minhashBandsNarrow(Dedup.shingleArrays(incoming, "doc_id", "text", 3), 16, 2),
        Dedup.shingleArrays(incoming, "doc_id", "text", 3),
        Dedup.minhashBandsNarrow(Dedup.shingleArrays(corpus, "doc_id", "text", 3), 16, 2),
        Dedup.shingleArrays(corpus, "doc_id", "text", 3), threshold = 0.5)
      exact.groupBy(col("verdict")).agg(count(lit(1)).as("n"))
        .unionByName(near.agg(count(lit(1)).as("n"))
          .select(lit("near_pair").as("verdict"), col("n")))
        .orderBy(col("verdict"))
    }, Some(
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
         |incoming AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 300 AND doc_id < 450
         |  UNION ALL SELECT doc_id + 5000000000 AS doc_id, text FROM documents WHERE doc_id < 10
         |  UNION ALL SELECT doc_id + 6000000000 AS doc_id, text || ' incremental near variant' AS text
         |    FROM documents WHERE doc_id >= 10 AND doc_id < 20
         |  UNION ALL SELECT doc_id + 7000000000 AS doc_id, text FROM documents WHERE doc_id = 300),
         |fps AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM incoming),
         |cfps AS (SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM corpus),
         |exact AS (SELECT fps.doc_id,
         |    CASE WHEN cfps.fp IS NOT NULL THEN 'known_dup'
         |         WHEN fps.doc_id <> MIN(fps.doc_id) OVER (PARTITION BY fps.fp) THEN 'batch_dup'
         |         ELSE 'new' END AS verdict
         |  FROM fps LEFT JOIN cfps ON fps.fp = cfps.fp),
         |allsides AS (SELECT 'c' AS side, doc_id, text FROM corpus
         |  UNION ALL SELECT 'n' AS side, doc_id, text FROM incoming),
         |toks AS (SELECT side, doc_id, $toksSql AS t FROM allsides WHERE len($toksSql) >= 3),
         |sh AS (SELECT DISTINCT side, doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] AS shingle
         |       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(x)),
         |sig AS (SELECT side, doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS minhash
         |        FROM sh, UNNEST(generate_series(0, 15)) AS g(i)
         |        GROUP BY side, doc_id, i),
         |bands AS (SELECT side, doc_id, i // 2 AS band, md5(string_agg(minhash, ',' ORDER BY i)) AS band_sig
         |          FROM sig GROUP BY side, doc_id, band),
         |cand AS (SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_other
         |         FROM bands n JOIN bands o ON n.band = o.band AND n.band_sig = o.band_sig
         |         WHERE n.side = 'n'
         |           AND (o.side = 'c' OR (o.side = 'n' AND o.doc_id < n.doc_id))),
         |counts AS (SELECT doc_id, COUNT(*) AS cnt FROM sh GROUP BY doc_id),
         |common AS (SELECT c.id_new, c.id_other, COUNT(*) AS n_common
         |           FROM cand c JOIN sh a ON a.doc_id = c.id_new
         |           JOIN sh b ON b.doc_id = c.id_other AND b.shingle = a.shingle
         |           GROUP BY 1, 2),
         |near AS (SELECT id_new FROM common
         |         JOIN counts ca ON ca.doc_id = id_new
         |         JOIN counts cb ON cb.doc_id = id_other
         |         WHERE CAST(n_common AS DOUBLE) / (ca.cnt + cb.cnt - n_common) >= 0.5)
         |SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n FROM exact GROUP BY verdict
         |UNION ALL SELECT 'near_pair' AS verdict, CAST(COUNT(*) AS BIGINT) AS n FROM near
         |ORDER BY verdict""".stripMargin)),

    // ---- data mixing: per-source sampling fractions ("all of src0, half
    // of src1, none of src2, a quarter of the rest") as a deterministic
    // pure-function-of-id program — df.sampleBy's per-partition RNG would
    // give a different mix on every repartition. Oracle recomputes the
    // identical md5 buckets.
    Q("q66_corpus_mixing", (s, d) =>
      graft.operators.Sampling.stratifiedSample(
        tbl(s, d, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), defaultFraction = 0.25)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .orderBy(col("source")),
      Some(
        """WITH b AS (SELECT source,
          |  substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8) AS bucket
          |  FROM documents)
          |SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM b
          |WHERE CASE WHEN source = 'src0' THEN TRUE
          |           WHEN source = 'src1' THEN bucket < '80000000'
          |           WHEN source = 'src2' THEN FALSE
          |           ELSE bucket < '40000000' END
          |GROUP BY source ORDER BY source""".stripMargin)),

    // ---- token-budget packing: fill each source's token budget in
    // deterministic id order ("N tokens per domain"); the window's running
    // total rides out as the audit column
    Q("q67_token_budget_pack", (s, d) =>
      graft.operators.Sampling.packByBudget(
        tbl(s, d, "documents").select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", "source", budget = 2000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), max(col("cum_weight")).as("tokens_packed"))
        .orderBy(col("source")),
      Some(
        s"""WITH t AS (SELECT doc_id, source, len($toksSql) AS n_tokens FROM documents),
           |c AS (SELECT doc_id, source, SUM(n_tokens) OVER
           |  (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(MAX(cum) AS BIGINT) AS tokens_packed
           |FROM c WHERE cum <= 2000 GROUP BY source ORDER BY source""".stripMargin)),

    // ---- benchmark decontamination: training docs sharing an 8-gram with
    // any eval doc. The planted bench set lifts two full train docs (hits
    // guaranteed) plus one synthetic doc with no corpus overlap (must be
    // absent). The bench gram table broadcasts — training data never
    // shuffles.
    Q("q68_decontamination", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val bench = docs.where(col("doc_id").isin(3, 7))
        .select((col("doc_id") + 8000900000L).as("doc_id"), col("text"))
        .unionByName(s.range(1).select(lit(8000999999L).as("doc_id"),
          lit("entirely synthetic benchmark question with no overlap whatsoever").as("text")))
      Dedup.contamination(docs, "doc_id", "text", bench, "doc_id", "text", n = 8)
        .orderBy(col("train_id"), col("bench_id"))
    }, Some(
      s"""WITH bench AS (
         |  SELECT doc_id + 8000900000 AS doc_id, text FROM documents WHERE doc_id IN (3, 7)
         |  UNION ALL SELECT 8000999999 AS doc_id,
         |    'entirely synthetic benchmark question with no overlap whatsoever' AS text),
         |ttoks AS (SELECT doc_id, $toksSql AS t FROM documents WHERE len($toksSql) >= 8),
         |tsh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] || ' ' || t[x+3]
         |  || ' ' || t[x+4] || ' ' || t[x+5] || ' ' || t[x+6] || ' ' || t[x+7] AS shingle
         |  FROM ttoks, UNNEST(generate_series(1, len(t) - 7)) AS g(x)),
         |btoks AS (SELECT doc_id, $toksSql AS t FROM bench WHERE len($toksSql) >= 8),
         |bsh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] || ' ' || t[x+3]
         |  || ' ' || t[x+4] || ' ' || t[x+5] || ' ' || t[x+6] || ' ' || t[x+7] AS shingle
         |  FROM btoks, UNNEST(generate_series(1, len(t) - 7)) AS g(x))
         |SELECT a.doc_id AS train_id, b.doc_id AS bench_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |FROM tsh a JOIN bsh b USING (shingle)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- NEAR-duplicate decontamination: the fuzzy tier above q68's
    // exact-gram screen — a paraphrased/mutated copy of an eval doc shares
    // few verbatim 8-grams but keeps high 3-gram Jaccard. Contract (the
    // q102 pattern): 20 bench docs are planted back into training with a
    // deterministic token mutation (every 20th token replaced ⇒ ~85% of
    // 3-gram windows survive ⇒ J ≈ 0.74, far above the 0.5 verify
    // threshold yet with ZERO shared 8-grams around each mutation site);
    // the oracle needs only the planted count — recall ≥80% of planted
    // copies flagged, containment by construction (the verify is an exact
    // Jaccard, so min over emitted pairs clears the threshold).
    Q("q107_near_decontamination", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") < 20)
      val planted = bench.select((col("doc_id") + 8020000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          (w, i) => when(i % 20 === 7, lit("zq")).otherwise(w)), " ").as("text"))
      val train = docs.filter(col("doc_id") >= 20).unionByName(planted)
      val flagged = Dedup.nearContamination(train, "doc_id", "text",
        bench, "doc_id", "text", n = 3, k = 16, rowsPerBand = 2, threshold = 0.5)
      val hits = flagged.select(col("train_id")).distinct()
        .where(col("train_id") >= 8020000000L)
      bench.agg(count(lit(1)).as("n_planted"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .crossJoin(flagged.agg(coalesce(min(col("jaccard")), lit(1.0)).as("min_j")))
        .select(col("n_planted"),
          (col("n_hit") >= lit(0.8) * col("n_planted")).as("recall_ok"),
          (col("min_j") >= 0.5).as("containment_ok"))
    }, Some(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
        |  TRUE AS recall_ok, TRUE AS containment_ok
        |FROM documents WHERE doc_id < 20""".stripMargin)),

    // ---- bloom-tier decontamination: same planted scenario and the SAME
    // oracle as q68 — the bloom prefilter (distributed sketch build,
    // map-side zero-shuffle probe over the corpus) may only change which
    // rows reach the exact-verify tier, never the answer (no false
    // negatives + exact verify). The hash compare against q68's oracle IS
    // the proof the sketch tier is sound.
    Q("q83_bloom_decontamination", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val bench = docs.where(col("doc_id").isin(3, 7))
        .select((col("doc_id") + 8000900000L).as("doc_id"), col("text"))
        .unionByName(s.range(1).select(lit(8000999999L).as("doc_id"),
          lit("entirely synthetic benchmark question with no overlap whatsoever").as("text")))
      Dedup.contaminationBloom(docs, "doc_id", "text", bench, "doc_id", "text",
        n = 8, expectedBenchGrams = 4096)
        .orderBy(col("train_id"), col("bench_id"))
    }, Some(
      s"""WITH bench AS (
         |  SELECT doc_id + 8000900000 AS doc_id, text FROM documents WHERE doc_id IN (3, 7)
         |  UNION ALL SELECT 8000999999 AS doc_id,
         |    'entirely synthetic benchmark question with no overlap whatsoever' AS text),
         |ttoks AS (SELECT doc_id, $toksSql AS t FROM documents WHERE len($toksSql) >= 8),
         |tsh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] || ' ' || t[x+3]
         |  || ' ' || t[x+4] || ' ' || t[x+5] || ' ' || t[x+6] || ' ' || t[x+7] AS shingle
         |  FROM ttoks, UNNEST(generate_series(1, len(t) - 7)) AS g(x)),
         |btoks AS (SELECT doc_id, $toksSql AS t FROM bench WHERE len($toksSql) >= 8),
         |bsh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] || ' ' || t[x+3]
         |  || ' ' || t[x+4] || ' ' || t[x+5] || ' ' || t[x+6] || ' ' || t[x+7] AS shingle
         |  FROM btoks, UNNEST(generate_series(1, len(t) - 7)) AS g(x))
         |SELECT a.doc_id AS train_id, b.doc_id AS bench_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |FROM tsh a JOIN bsh b USING (shingle)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- PII redaction: emails/SSNs/phones/IPv4 → typed placeholders, the
    // pre-training scrub pass. The corpus is synthetic word-soup with no
    // real PII, so known spans are planted per id range; the redacted text
    // itself is oracle-checked via md5 (both engines run the identical
    // Java/RE2-common regex program). Pure narrow column work — no shuffle.
    Q("q69_pii_redaction", (s, d) => {
      import graft.functions.PiiFunctions
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val planted = docs.where(col("doc_id") < 30)
        .select(col("doc_id"), concat(col("text"),
          lit(" contact alice.smith@example-corp.com or bob99@mail.example.org")).as("text"))
        .unionByName(docs.where(col("doc_id") >= 30 && col("doc_id") < 60)
          .select(col("doc_id"), concat(col("text"),
            lit(" call 555-867-5309 or 410.555.1234")).as("text")))
        .unionByName(docs.where(col("doc_id") >= 60 && col("doc_id") < 90)
          .select(col("doc_id"), concat(col("text"),
            lit(" ssn 123-45-6789 on file")).as("text")))
        .unionByName(docs.where(col("doc_id") >= 90 && col("doc_id") < 120)
          .select(col("doc_id"), concat(col("text"),
            lit(" from 192.168.1.100 and 10.0.0.7")).as("text")))
        .unionByName(docs.where(col("doc_id") >= 120))
      planted.select(col("doc_id"),
          PiiFunctions.emailCount(col("text")).as("n_email"),
          PiiFunctions.ssnCount(col("text")).as("n_ssn"),
          PiiFunctions.phoneCount(col("text")).as("n_phone"),
          PiiFunctions.ipv4Count(col("text")).as("n_ip"),
          md5(PiiFunctions.redactPii(col("text")).cast("binary")).as("redacted_fp"))
        .where(col("n_email") + col("n_ssn") + col("n_phone") + col("n_ip") > 0)
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH planted AS (
         |  SELECT doc_id, text || ' contact alice.smith@example-corp.com or bob99@mail.example.org' AS text
         |  FROM documents WHERE doc_id < 30
         |  UNION ALL SELECT doc_id, text || ' call 555-867-5309 or 410.555.1234'
         |  FROM documents WHERE doc_id >= 30 AND doc_id < 60
         |  UNION ALL SELECT doc_id, text || ' ssn 123-45-6789 on file'
         |  FROM documents WHERE doc_id >= 60 AND doc_id < 90
         |  UNION ALL SELECT doc_id, text || ' from 192.168.1.100 and 10.0.0.7'
         |  FROM documents WHERE doc_id >= 90 AND doc_id < 120
         |  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id >= 120),
         |c AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS BIGINT) AS n_ssn,
         |  CAST(len(regexp_extract_all(text, '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(text, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT) AS n_ip,
         |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<SSN>', 'g'),
         |    '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b', '<PHONE>', 'g'),
         |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')) AS redacted_fp
         |  FROM planted)
         |SELECT * FROM c WHERE n_email + n_ssn + n_phone + n_ip > 0
         |ORDER BY doc_id""".stripMargin)),

    // ---- duplicate CLUSTERS: LSH candidates → Jaccard-verified pairs →
    // connected components (hash-min label propagation), so overlapping
    // pairs collapse into groups with one canonical survivor each. The
    // planted corpus yields 3-member clusters (base + near variant + exact
    // copy) for ids < 20 and 2-member clusters for 20 ≤ id < 50. Oracle
    // recomputes the identical deterministic LSH pipeline, then closes the
    // pair graph with a recursive CTE.
    Q("q70_dup_clusters", (s, d) => {
      // pin shingle/minhash width (q47's measured trap: a small parquet
      // corpus scans as 1-3 partitions and serializes the CPU-bound stages)
      val planted = withPlanted(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      // arrays feeds three plan branches (bands + both verify fetches);
      // checkpoint it once, as Dedup.clusters does for its edge set
      val arrays = Dedup.shingleArrays(planted, "doc_id", "text", n = 3)
        .localCheckpoint()
      val candidates = Dedup.lshCandidates(
        Dedup.minhashBandsNarrow(arrays, k = 16, rowsPerBand = 2))
      val pairs = Dedup.jaccardOnArrays(candidates, arrays)
        .where(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.clusters(pairs)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
        .orderBy(col("cluster_id"))
    }, Some(
      s"""WITH RECURSIVE docs AS ($plantedSql),
         |toks AS (SELECT doc_id, $toksSql AS t FROM docs WHERE len($toksSql) >= 3),
         |sh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] AS shingle
         |       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(x)),
         |sig AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS minhash
         |        FROM sh, UNNEST(generate_series(0, 15)) AS g(i)
         |        GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i // 2 AS band, md5(string_agg(minhash, ',' ORDER BY i)) AS band_sig
         |          FROM sig GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
         |         WHERE a.doc_id < b.doc_id),
         |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |common AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_common
         |           FROM cand c JOIN sh a ON a.doc_id = c.id_a
         |           JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |           GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM common
         |          JOIN counts ca ON ca.doc_id = id_a
         |          JOIN counts cb ON cb.doc_id = id_b
         |          WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
         |verts AS (SELECT DISTINCT src AS v FROM edges),
         |reach AS (SELECT v, v AS r FROM verts
         |          UNION
         |          SELECT e.dst AS v, reach.r FROM reach JOIN edges e ON e.src = reach.v),
         |labels AS (SELECT v, MIN(r) AS cluster_id FROM reach GROUP BY v)
         |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_members, CAST(MAX(v) AS BIGINT) AS max_id
         |FROM labels GROUP BY cluster_id ORDER BY cluster_id""".stripMargin),
      bench = true),

    // ---- duplicate clustering at SCALE: q70's exact operator chain,
    // verified by a contract whose oracle is O(planted) — no corpus-wide
    // recursive CTE (closing the pair graph in DuckDB exhausted the r7
    // sf3 gate's temp disk, so the heaviest graph operator had no 30×
    // correctness point). 60 clusters with known ids/sizes are synthesized
    // from cluster-private vocabulary (every token is `qzjxc<c>…`; the
    // corpus word-soup has no qzjx* tokens, so EVERY 3-gram of a planted
    // doc is cluster-private): planted members can pair only within their
    // own cluster at ANY scale factor, and because the planted texts
    // don't depend on the corpus, their signatures/bands/verified pairs
    // are byte-identical from sf0.001 to sf20. The operator still runs
    // over corpus ∪ plants — its COST scales with the corpus (natural
    // replica clusters at sf≥1 are computed, then filtered) while the
    // planted answer stays closed-form: cluster c has 2+(c%4) members
    // (41 for c=59, the hot-cluster stand-in), cluster_id = min id,
    // max_id = min + size - 1. Members share 18 of 20 3-grams (J = 0.9);
    // with 8 bands of 2 rows the per-pair candidate-miss probability is
    // (1-0.81)^8 ≈ 2e-6 and the within-cluster candidate graph is
    // near-complete, so the components are exact in practice and
    // deterministic per text (md5 minhash).
    Q("q109_dup_clusters_contract", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val sizeOf = when(col("c") === 59, lit(41L)).otherwise(lit(2L) + col("c") % 4)
      val cs = col("c").cast("string")
      val core = concat_ws(" ",
        (0 until 20).map(k => concat(lit("qzjxc"), cs, lit(s"w$k"))): _*)
      val plants = s.range(60).select(col("id").as("c"))
        .select(col("c"), explode(sequence(lit(0L), sizeOf - 1L)).as("j"))
        .select((lit(8100000000L) + col("c") * 100L + col("j")).as("doc_id"),
          concat(core, lit(" qzjxs"), cs, lit("m"), col("j").cast("string")).as("text"))
      val planted = docs.unionByName(plants)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val arrays = Dedup.shingleArrays(planted, "doc_id", "text", n = 3)
        .localCheckpoint()
      val candidates = Dedup.lshCandidates(
        Dedup.minhashBandsNarrow(arrays, k = 16, rowsPerBand = 2))
      val pairs = Dedup.jaccardOnArrays(candidates, arrays)
        .where(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.clusters(pairs)
        .where(col("cluster_id") >= 8100000000L)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
        .orderBy(col("cluster_id"))
    }, Some(
      """SELECT CAST(8100000000 + c * 100 AS BIGINT) AS cluster_id,
        |  CAST(CASE WHEN c = 59 THEN 41 ELSE 2 + c % 4 END AS BIGINT) AS n_members,
        |  CAST(8100000000 + c * 100
        |    + (CASE WHEN c = 59 THEN 41 ELSE 2 + c % 4 END) - 1 AS BIGINT) AS max_id
        |FROM generate_series(0, 59) AS g(c)
        |ORDER BY cluster_id""".stripMargin)),

    // ---- duplicate-cluster representatives by QUALITY policy (q70's
    // clusters, but the BEST copy survives, not the smallest id — dedup
    // should keep the highest-quality member). Same deterministic banded
    // pipeline; the oracle adds a quality-argmax window over the recursive
    // components.
    Q("q96_cluster_representatives", (s, d) => {
      // width pin: see q70
      val planted = withPlanted(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val arrays = Dedup.shingleArrays(planted, "doc_id", "text", n = 3)
        .localCheckpoint() // three consumers: see q70
      val candidates = Dedup.lshCandidates(
        Dedup.minhashBandsNarrow(arrays, k = 16, rowsPerBand = 2))
      val pairs = Dedup.jaccardOnArrays(candidates, arrays)
        .where(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      val scores = planted.select(col("doc_id").as("id"),
        round(TextFunctions.qualityScore(col("text")), 4).as("score"))
      Dedup.clusterRepresentatives(Dedup.clusters(pairs), scores)
        .orderBy(col("cluster_id"))
    }, Some(
      s"""WITH RECURSIVE docs AS ($plantedSql),
         |toks AS (SELECT doc_id, $toksSql AS t FROM docs WHERE len($toksSql) >= 3),
         |sh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] AS shingle
         |       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(x)),
         |sig AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS minhash
         |        FROM sh, UNNEST(generate_series(0, 15)) AS g(i)
         |        GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i // 2 AS band, md5(string_agg(minhash, ',' ORDER BY i)) AS band_sig
         |          FROM sig GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
         |         WHERE a.doc_id < b.doc_id),
         |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |common AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_common
         |           FROM cand c JOIN sh a ON a.doc_id = c.id_a
         |           JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |           GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b FROM common
         |          JOIN counts ca ON ca.doc_id = id_a
         |          JOIN counts cb ON cb.doc_id = id_b
         |          WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
         |verts AS (SELECT DISTINCT src AS v FROM edges),
         |reach AS (SELECT v, v AS r FROM verts
         |          UNION
         |          SELECT e.dst AS v, reach.r FROM reach JOIN edges e ON e.src = reach.v),
         |labels AS (SELECT v, MIN(r) AS cluster_id FROM reach GROUP BY v),
         |q AS (SELECT doc_id, ROUND($qualitySql, 4) AS score FROM docs),
         |ranked AS (SELECT labels.cluster_id, labels.v, q.score,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY q.score DESC, labels.v) AS rn,
         |    COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
         |  FROM labels JOIN q ON q.doc_id = labels.v)
         |SELECT CAST(cluster_id AS BIGINT) AS cluster_id, CAST(v AS BIGINT) AS keep_id,
         |  score AS keep_score, CAST(n_members AS BIGINT) AS n_members
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin)),

    // ---- the END-TO-END training-corpus build, every stage an operator
    // this library ships: quality/lang gate + exact & near dedup
    // (CorpusPipeline) → benchmark decontamination → deterministic 80%
    // sample → token-budget pack → epoch-0 training order. The output IS
    // the train-ready manifest (docs in training order with their packed
    // cumulative token counts), and the oracle mirrors every stage
    // exactly — the strongest single statement that the composed pipeline
    // is deterministic and engine-portable end to end.
    Q("q99_train_corpus_build", (s, d) => {
      val ann = graft.operators.CorpusPipeline.annotate(withPlanted(s, d),
        graft.operators.CorpusPipeline.Config(
          parallelism = Some(s.sparkContext.defaultParallelism)))
      // clean feeds both the contamination probe and the decon anti-join;
      // checkpoint so the whole annotate pipeline (LSH included) runs once
      val clean = ann.where(col("reject_reason").isNull)
        .select(col("doc_id"), col("text"), col("n_tokens"))
        .localCheckpoint()
      val bench = tbl(s, d, "documents").where(col("doc_id").isin(3, 7))
        .select((col("doc_id") + 8000900000L).as("doc_id"), col("text"))
      val contaminated = Dedup.contamination(clean, "doc_id", "text",
          bench, "doc_id", "text", n = 8)
        .select(col("train_id").as("doc_id")).distinct()
      val decon = clean.join(contaminated, Seq("doc_id"), "left_anti")
      val sampled = graft.operators.Sampling.deterministicSample(decon, "doc_id", 0.8)
        .withColumn("stratum", lit("all"))
      val packed = graft.operators.Sampling.packByBudget(
        sampled, "doc_id", "n_tokens", "stratum", budget = 10000)
      graft.operators.Sampling.epochShuffle(
          packed.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
            col("cum_weight")),
          "doc_id", epoch = 0)
        .select(col("shuffle_key"), col("doc_id"), col("n_tokens"), col("cum_weight"))
    }, Some {
      val thr80 = graft.operators.Sampling.hexThreshold(0.8)
      s"""WITH docs AS ($plantedSql),
         |base AS (SELECT doc_id, text, ROUND($qualitySql, 4) AS quality,
         |  $langIdSql AS lang_pred, len($toksSql) AS n_tokens,
         |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM docs),
         |we AS (SELECT base.*, doc_id <> MIN(doc_id) OVER (PARTITION BY fp) AS exact_dup FROM base),
         |survivors AS (SELECT doc_id, text FROM we WHERE NOT exact_dup),
         |toks3 AS (SELECT doc_id, $toksSql AS t FROM survivors WHERE len($toksSql) >= 3),
         |sh3 AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] AS shingle
         |       FROM toks3, UNNEST(generate_series(1, len(t) - 2)) AS g(x)),
         |sig AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS minhash
         |        FROM sh3, UNNEST(generate_series(0, 15)) AS g(i)
         |        GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i // 2 AS band, md5(string_agg(minhash, ',' ORDER BY i)) AS band_sig
         |          FROM sig GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
         |         WHERE a.doc_id < b.doc_id),
         |counts3 AS (SELECT doc_id, COUNT(*) AS n FROM sh3 GROUP BY doc_id),
         |common3 AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_common
         |           FROM cand c JOIN sh3 a ON a.doc_id = c.id_a
         |           JOIN sh3 b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |           GROUP BY 1, 2),
         |near AS (SELECT DISTINCT id_b AS doc_id FROM common3
         |         JOIN counts3 ca ON ca.doc_id = id_a JOIN counts3 cb ON cb.doc_id = id_b
         |         WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.5),
         |clean AS (SELECT we.doc_id, we.text, we.n_tokens FROM we
         |  LEFT JOIN near ON we.doc_id = near.doc_id
         |  WHERE we.quality >= 0.5 AND we.n_tokens >= 5 AND we.lang_pred = 'en'
         |    AND NOT we.exact_dup AND near.doc_id IS NULL),
         |bench AS (SELECT doc_id + 8000900000 AS doc_id, text FROM docs_src
         |  WHERE doc_id IN (3, 7)),
         |ttoks AS (SELECT doc_id, $toksSql AS t FROM clean WHERE len($toksSql) >= 8),
         |tsh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] || ' ' || t[x+3]
         |  || ' ' || t[x+4] || ' ' || t[x+5] || ' ' || t[x+6] || ' ' || t[x+7] AS shingle
         |  FROM ttoks, UNNEST(generate_series(1, len(t) - 7)) AS g(x)),
         |btoks AS (SELECT doc_id, $toksSql AS t FROM bench WHERE len($toksSql) >= 8),
         |bsh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] || ' ' || t[x+3]
         |  || ' ' || t[x+4] || ' ' || t[x+5] || ' ' || t[x+6] || ' ' || t[x+7] AS shingle
         |  FROM btoks, UNNEST(generate_series(1, len(t) - 7)) AS g(x)),
         |contaminated AS (SELECT DISTINCT a.doc_id FROM tsh a JOIN bsh b USING (shingle)),
         |decon AS (SELECT clean.* FROM clean
         |  LEFT JOIN contaminated c ON c.doc_id = clean.doc_id WHERE c.doc_id IS NULL),
         |sampled AS (SELECT * FROM decon
         |  WHERE substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8) < '$thr80'),
         |packed AS (SELECT doc_id, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_weight
         |  FROM sampled)
         |SELECT md5('graft:0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
         |  doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(cum_weight AS BIGINT) AS cum_weight
         |FROM packed WHERE cum_weight <= 10000
         |ORDER BY shuffle_key, doc_id""".stripMargin
        .replace("docs_src", "documents")
    }, bench = true),

    // ---- TF-IDF keyword extraction: top-3 terms per doc by tf·(N/df).
    // Raw idf (N/df, no log) keeps the score an exact integer ratio — IEEE
    // division is bit-identical across engines, so ranking parity is exact
    // (ln() would differ in the last ulp between libm builds). Emits (tf,
    // df) integers, not the float score. df is corpus-global; the per-doc
    // window ranks only the reported id slice.
    Q("q71_tfidf_keywords", (s, d) => {
      val terms = tbl(s, d, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = broadcast(tf.select(col("doc_id")).distinct()
        .agg(count(lit(1)).as("n_docs")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy((col("tf").cast("double") * col("n_docs") / col("df")).desc, col("term"))
      tf.where(col("doc_id") < 100)
        .join(dfreq, Seq("term"))
        .crossJoin(nDocs)
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
        .orderBy(col("doc_id"), col("rank"))
    }, Some(
      s"""WITH terms AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM terms GROUP BY 1, 2),
         |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
         |ranked AS (SELECT doc_id, term, tf, df,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY CAST(tf AS DOUBLE) * n_docs / df DESC, term) AS BIGINT) AS rank
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
         |  WHERE doc_id < 100)
         |SELECT doc_id, rank, term, tf, df FROM ranked WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin)),

    // ---- truncation-duplicate detection: group by the first-K-token
    // fingerprint, catching the same article cut at different lengths —
    // invisible to whole-text exact dedup (different md5) and expensive for
    // MinHash (a long doc and its short prefix have low Jaccard). One
    // shuffle of 32-byte prefix fingerprints, documents never move.
    // Planted: docs with ≥ 40 tokens re-enter truncated to their first 30
    // tokens (sharing the K=20 prefix with their source).
    Q("q72_prefix_dedup", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val toks = TextFunctions.tokens(col("text"))
      val truncated = docs
        .where(col("doc_id") < 200 && size(toks) >= 40)
        .select((col("doc_id") + 8000800000L).as("doc_id"),
          concat_ws(" ", slice(toks, 1, 30)).as("text"))
      val planted = docs.unionByName(truncated)
      val pToks = TextFunctions.tokens(col("text"))
      planted
        .select(col("doc_id"),
          md5(concat_ws(" ", slice(pToks, 1, 20)).cast("binary")).as("prefix_fp"))
        .groupBy(col("prefix_fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
        .where(col("dup_count") > 1)
        .orderBy(col("prefix_fp"))
    }, Some(
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 8000800000 AS doc_id,
         |    array_to_string(list_slice($toksSql, 1, 30), ' ') AS text
         |  FROM documents WHERE doc_id < 200 AND len($toksSql) >= 40),
         |fps AS (SELECT doc_id,
         |  md5(array_to_string(list_slice($toksSql, 1, 20), ' ')) AS prefix_fp
         |  FROM docs)
         |SELECT prefix_fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
         |  CAST(COUNT(*) AS BIGINT) AS dup_count
         |FROM fps GROUP BY prefix_fp HAVING COUNT(*) > 1
         |ORDER BY prefix_fp""".stripMargin)),

    // ---- token-window chunking: split each doc into fixed-size token
    // windows with overlap (size 80, stride 60) — the standard context-
    // window preprocessing step before tokenization. Chunk count is exact
    // integer math (1 + ceil((len-80)/60) via div), so engine parity is
    // arithmetic, not float. Narrow explode, no shuffle; chunk text is
    // checked via md5.
    Q("q73_token_chunks", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
        .where(col("doc_id") < 200)
      docs
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .where(size(col("t")) > 0)
        .withColumn("n_chunks",
          when(size(col("t")) <= 80, lit(1L))
            .otherwise(expr("(size(t) - 21) div 60") + 1L))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          slice(col("t"), (col("chunk_id") * 60 + 1).cast("int"), lit(80)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("n_chunk_tokens"),
          md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }, Some(
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents
         |  WHERE doc_id < 200 AND len($toksSql) > 0),
         |spans AS (SELECT doc_id, t,
         |    CASE WHEN len(t) <= 80 THEN 1 ELSE (len(t) - 21) // 60 + 1 END AS n_chunks
         |  FROM toks),
         |chunks AS (SELECT doc_id, x AS chunk_id,
         |    list_slice(t, CAST(x * 60 + 1 AS INT), CAST(x * 60 + 80 AS INT)) AS chunk
         |  FROM spans, UNNEST(generate_series(0, n_chunks - 1)) AS g(x))
         |SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(chunk, ' ')) AS chunk_fp
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- paragraph-level exact dedup (boilerplate removal): paragraphs
    // repeated across documents (nav bars, cookie banners, footers) are
    // dropped everywhere but their first (doc_id, position) occurrence and
    // documents are reassembled from the survivors. Planted: a shared
    // footer on docs < 200, a shared header on docs < 50 — the repeated
    // paragraphs whole-doc dedup (q33) is blind to. The keep/drop window
    // shuffles fingerprints only; paragraph text moves once (reassembly).
    Q("q75_paragraph_dedup", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") < 50,
            lit("cookie notice we use cookies to improve your experience\n\n"))
            .otherwise(lit("")),
          col("text"),
          when(col("doc_id") < 200,
            lit("\n\nsubscribe to our newsletter for more updates"))
            .otherwise(lit(""))).as("text"))
      graft.operators.Dedup.paragraphDedup(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("clean_text").cast("binary")).as("clean_fp"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH docs AS (SELECT doc_id,
        |    CASE WHEN doc_id < 50
        |         THEN 'cookie notice we use cookies to improve your experience'
        |              || chr(10) || chr(10) ELSE '' END
        |    || text ||
        |    CASE WHEN doc_id < 200
        |         THEN chr(10) || chr(10)
        |              || 'subscribe to our newsletter for more updates'
        |         ELSE '' END AS text
        |  FROM documents),
        |paras AS (SELECT doc_id, x AS i, p[x] AS para
        |  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS p
        |        FROM docs) t,
        |  UNNEST(generate_series(1, len(p))) AS g(x)),
        |keyed AS (SELECT doc_id, i, para,
        |    md5(trim(regexp_replace(lower(para), '\s+', ' ', 'g'))) AS fp
        |  FROM paras),
        |keep AS (SELECT doc_id, i, para,
        |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, i) AS rn
        |  FROM keyed),
        |kept AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |    string_agg(para, chr(10) || chr(10) ORDER BY i) AS clean_text
        |  FROM keep WHERE rn = 1 GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, chr(10) || chr(10))) AS BIGINT) AS n_paras,
        |  COALESCE(kept.n_kept, 0) AS n_kept, md5(kept.clean_text) AS clean_fp
        |FROM docs d LEFT JOIN kept USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // ---- shingle containment (partial-copy detection): a prefix copy of a
    // long document has LOW Jaccard (≈ |A|/|B|) but containment ≈ 1 — the
    // case Jaccard-thresholded near-dup removal under-scores. Candidates
    // come from the same deterministic banded-LSH join (both engines
    // compute identical bands, so the candidate set is identical — no
    // probabilistic oracle fragility); the verify is one array_intersect
    // per pair. Planted: 150-char prefix copies of docs < 40.
    Q("q76_containment", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val planted = docs.unionByName(
        docs.filter(col("doc_id") < 40)
          .select((col("doc_id") + 3000000000L).as("doc_id"),
            substring(col("text"), 1, 150).as("text")))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id")) // width pin: see q70
      val arrays = graft.operators.Dedup.shingleArrays(planted, "doc_id", "text", n = 3)
        .localCheckpoint() // three consumers: see q70
      val cands = graft.operators.Dedup.lshCandidates(
        graft.operators.Dedup.minhashBandsNarrow(arrays, 16, 2))
      graft.operators.Dedup.containmentOnArrays(cands, arrays)
        .where(greatest(col("containment_a"), col("containment_b")) >= 0.9
          && col("jaccard") < 0.9)
        .select(col("id_a"), col("id_b"), col("containment_a"),
          col("containment_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 3000000000 AS doc_id, substr(text, 1, 150) AS text
         |  FROM documents WHERE doc_id < 40),
         |toks AS (SELECT doc_id, $toksSql AS t FROM docs WHERE len($toksSql) >= 3),
         |sh AS (SELECT DISTINCT doc_id, t[x] || ' ' || t[x+1] || ' ' || t[x+2] AS shingle
         |       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(x)),
         |sig AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS minhash
         |        FROM sh, UNNEST(generate_series(0, 15)) AS g(i)
         |        GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i // 2 AS band,
         |          md5(string_agg(minhash, ',' ORDER BY i)) AS band_sig
         |          FROM sig GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.band_sig = b.band_sig
         |         WHERE a.doc_id < b.doc_id),
         |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |common AS (SELECT id_a, id_b, COUNT(*) AS common
         |           FROM cand JOIN sh a ON a.doc_id = id_a
         |           JOIN sh b ON b.doc_id = id_b AND b.shingle = a.shingle
         |           GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  CAST(common AS DOUBLE) / ca.n AS containment_a,
         |  CAST(common AS DOUBLE) / cb.n AS containment_b,
         |  CAST(common AS DOUBLE) / (ca.n + cb.n - common) AS jaccard
         |FROM common JOIN counts ca ON ca.doc_id = id_a
         |JOIN counts cb ON cb.doc_id = id_b
         |WHERE GREATEST(CAST(common AS DOUBLE) / ca.n,
         |               CAST(common AS DOUBLE) / cb.n) >= 0.9
         |  AND CAST(common AS DOUBLE) / (ca.n + cb.n - common) < 0.9
         |ORDER BY id_a, id_b""".stripMargin)),

    // ---- source-level reputation filtering: the domain-filter pass of web
    // pipelines — aggregate document quality per source, drop sources in
    // the bottom quartile by average quality. Two tiny aggregations (20
    // sources) + a broadcast threshold; the 100 TB corpus contributes one
    // partial-agg pass, documents never shuffle.
    Q("q77_source_reputation", (s, d) => {
      val docs = tbl(s, d, "documents").select(col("source"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      val perSrc = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), avg(col("quality")).as("avg_q"))
      val thr = perSrc.agg(expr("percentile(avg_q, 0.25)").as("thr"))
      perSrc.crossJoin(broadcast(thr))
        .select(col("source"), col("n_docs"), round(col("avg_q"), 4).as("avg_q"),
          (col("avg_q") >= col("thr")).as("kept"))
        .orderBy(col("source"))
    }, Some(
      s"""WITH q AS (SELECT source, $qualitySql AS quality FROM documents),
         |per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    AVG(quality) AS avg_q FROM q GROUP BY source),
         |t AS (SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY avg_q) AS thr
         |      FROM per_src)
         |SELECT source, n_docs, ROUND(avg_q, 4) AS avg_q, avg_q >= thr AS kept
         |FROM per_src, t ORDER BY source""".stripMargin)),

    // ---- token-level repeated-span detection (exact-substring dedup, the
    // suffix-array "ExactSubstr" pass of Lee et al. 2022 re-expressed as
    // two keyed aggregations): every 10-token window occurring ≥2 times
    // corpus-wide is flagged and overlapping flags merge into maximal
    // spans. The planted corpus guarantees real work: exact copies (docs
    // <20) duplicate every gram, near-dup copies (docs <50) share all but
    // the trailing-mutation grams — so spans cover whole docs on one side
    // and stop short of the tail on the other, exercising the merge.
    Q("q103_repeated_spans", (s, d) =>
      // pin the gram-stage width (the q47/q70 measured trap: a compact
      // parquet corpus scans as 2-3 partitions and the CPU-bound
      // tokenize+md5 gram stage serializes on them)
      Dedup.repeatedSpans(withPlanted(s, d), "doc_id", "text", k = 10,
          parallelism = Some(s.sparkContext.defaultParallelism))
        .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
          col("span_tokens"))
        .orderBy(col("doc_id"), col("span_start")),
      Some(
        s"""WITH docs AS ($plantedSql),
           |toks AS (SELECT doc_id, $toksSql AS t FROM docs WHERE len($toksSql) >= 10),
           |grams AS (SELECT doc_id, CAST(x AS BIGINT) AS p,
           |          md5(array_to_string(t[x:x+9], ' ')) AS fp
           |          FROM toks, UNNEST(generate_series(1, len(t) - 9)) AS g(x)),
           |dupfp AS (SELECT fp FROM grams GROUP BY fp HAVING COUNT(*) >= 2),
           |isl AS (SELECT doc_id, p,
           |          CASE WHEN p > LAG(p) OVER (PARTITION BY doc_id ORDER BY p) + 10
           |               THEN 1 ELSE 0 END AS ns
           |        FROM grams WHERE fp IN (SELECT fp FROM dupfp)),
           |spans AS (SELECT doc_id, MIN(p) AS span_start, MAX(p) + 9 AS span_end
           |          FROM (SELECT doc_id, p,
           |                  SUM(ns) OVER (PARTITION BY doc_id ORDER BY p) AS island
           |                FROM isl) t
           |          GROUP BY doc_id, island)
           |SELECT doc_id, span_start, span_end,
           |  span_end - span_start + 1 AS span_tokens
           |FROM spans ORDER BY doc_id, span_start""".stripMargin),
      bench = true),

    // ---- repeated-span REMOVAL, keep-first: each duplicated 10-gram keeps
    // its (id, pos)-first occurrence, every other occurrence's window is
    // cut, documents reassemble from surviving tokens. clean_text is
    // md5-compared (q69/q75 pattern) so reassembly — not just counts — is
    // oracle-exact. Exact copies (docs <20) strip to empty on the copy
    // side and stay whole on the keeper side; within-doc template repeats
    // strip all but the first occurrence.
    Q("q104_strip_repeated_spans", (s, d) =>
      Dedup.stripRepeatedSpans(withPlanted(s, d), "doc_id", "text", k = 10,
          parallelism = Some(s.sparkContext.defaultParallelism))
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("clean_text").cast("binary")).as("clean_fp"))
        .orderBy(col("doc_id")),
      Some(
        s"""WITH docs AS ($plantedSql),
           |toksAll AS (SELECT doc_id, $toksSql AS t FROM docs),
           |toks AS (SELECT doc_id, t FROM toksAll WHERE len(t) >= 10),
           |grams AS (SELECT doc_id, CAST(x AS BIGINT) AS p,
           |          md5(array_to_string(t[x:x+9], ' ')) AS fp
           |          FROM toks, UNNEST(generate_series(1, len(t) - 9)) AS g(x)),
           |dupfp AS (SELECT fp FROM grams GROUP BY fp HAVING COUNT(*) >= 2),
           |losers AS (SELECT doc_id, p FROM (
           |    SELECT doc_id, p,
           |      ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, p) AS rn
           |    FROM grams WHERE fp IN (SELECT fp FROM dupfp)) t WHERE rn > 1),
           |isl AS (SELECT doc_id, p,
           |          CASE WHEN p > LAG(p) OVER (PARTITION BY doc_id ORDER BY p) + 10
           |               THEN 1 ELSE 0 END AS ns
           |        FROM losers),
           |spans AS (SELECT doc_id, MIN(p) AS s, MAX(p) + 9 AS e
           |          FROM (SELECT doc_id, p,
           |                  SUM(ns) OVER (PARTITION BY doc_id ORDER BY p) AS island
           |                FROM isl) t
           |          GROUP BY doc_id, island),
           |pos AS (SELECT doc_id, CAST(x AS BIGINT) AS i, t[x] AS tok
           |        FROM toksAll, UNNEST(generate_series(1, len(t))) AS g(x)),
           |keptpos AS (SELECT p.doc_id, p.i, p.tok FROM pos p
           |            WHERE NOT EXISTS (SELECT 1 FROM spans s
           |              WHERE s.doc_id = p.doc_id AND p.i BETWEEN s.s AND s.e)),
           |clean AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ct,
           |          CAST(COUNT(*) AS BIGINT) AS n_kept
           |          FROM keptpos GROUP BY doc_id)
           |SELECT a.doc_id, CAST(len(a.t) AS BIGINT) AS n_tokens,
           |  CAST(len(a.t) AS BIGINT) - COALESCE(clean.n_kept, 0) AS n_removed,
           |  md5(COALESCE(clean.ct, '')) AS clean_fp
           |FROM toksAll a LEFT JOIN clean USING (doc_id)
           |ORDER BY doc_id""".stripMargin))
  )
}
