package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (BASELINE north-star; SURVEY.md
  * §2.5): the per-document scoring pass every training-data pipeline runs
  * before filtering — token stats, quality ratios, language ID, content
  * fingerprint. Everything is built from codegen'd string/array functions;
  * per-document work is embarrassingly parallel (no shuffle until the final
  * corpus-level aggregation, which is O(vocabulary), not O(corpus)).
  *
  *  - token counting: whitespace split + a BPE-ish sub-token regex count
  *  - quality scoring: length / stopword / punctuation / repetition ratios
  *  - language ID: stopword-profile hit-rate heuristic (n-gram profiles are
  *    the real-world version; the profile table broadcasts either way)
  *  - fingerprinting: order-sensitive polynomial rolling hash mod 1e9+7
  */
object TextAnalysis extends QueryModule {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Corpus token frequencies: top 50 tokens by count. */
  def qTextTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(lower(trim(col("text"))), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  /** Per-document stats: exact whitespace tokens, BPE-ish sub-token count
    * (runs of letters / digits / single punctuation), avg token length,
    * stopword ratio, distinct-token ratio (repetition detector). */
  def qTextQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(lower(trim(col("text"))), " "))
      .select(
        col("doc_id"),
        col("n_chars"),
        size(col("toks")).as("n_tokens"),
        size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
          .as("n_subtokens"),
        round(expr("aggregate(toks, 0L, (a, t) -> a + length(t))")
          / size(col("toks")).cast("double"), 4).as("avg_token_len"),
        round(size(expr(s"filter(toks, t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")}))"))
          / size(col("toks")).cast("double"), 4).as("stopword_ratio"),
        round(size(array_distinct(col("toks"))) / size(col("toks")).cast("double"), 4)
          .as("distinct_ratio"))
      .orderBy(col("doc_id"))

  /** Stopword-profile language ID + agreement rate with the labeled lang. */
  def qTextLangid(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(lower(trim(col("text"))), " "))
      .withColumn("en_hits",
        size(expr(s"filter(toks, t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")}))")))
      .withColumn("lang_pred",
        when(col("en_hits") / size(col("toks")).cast("double") >= 0.02, "en")
          .otherwise("und"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))

  /** N-gram language ID, the real shape: per-language char-trigram profiles
    * (top 50 by corpus frequency, built from the labeled corpus — in
    * production these ship as a broadcast table trained offline), then each
    * document scores profile-overlap and takes the argmax language.
    * Self-referential on synthetic data, but the operator mechanics — build
    * profiles, broadcast, score, argmax — are the production pipeline.
    * Every ranking step is explicitly tie-broken (trigram asc within count,
    * profile_lang asc within score), which makes the whole chain a pure
    * function of the data — the DuckDB multi-CTE twin verifies it exactly. */
  def qTextLangidNgram(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // classify on the first 200 chars — langid saturates on a prefix, and
    // this caps the trigram explosion at 198 rows/doc regardless of doc size
    val docs = Tables.documents(spark, dir)
      .withColumn("head", substring(col("text"), 1, 200))
    // localCheckpoint: profiles AND scoring both consume the trigram table
    // (Catalyst has no cross-branch subplan reuse), and the 200-char cap
    // keeps the materialization small — intra-query only, freed on GC;
    // eager=false so plan dumps don't trigger jobs (see Dedup.jaccardPairs
    // for the reuse-vs-fault-tolerance notes)
    val trigrams = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(expr(
        """CASE WHEN length(head) < 3 THEN array()
          |ELSE transform(sequence(1, length(head) - 2), i -> substring(head, i, 3))
          |END""".stripMargin))).as("trigram"))
      .localCheckpoint(eager = false)
    val profileW = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("trigram"))
    val profiles = trigrams.groupBy(col("lang"), col("trigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(profileW))
      .filter(col("rk") <= 50)
      .select(col("lang").as("profile_lang"), col("trigram"),
        (lit(51) - col("rk")).as("weight"))
    val bestW = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("profile_lang"))
    val scored = trigrams.join(broadcast(profiles), "trigram")
      .groupBy(col("doc_id"), col("profile_lang"))
      .agg(sum(col("weight")).as("score"))
      .withColumn("rk", row_number().over(bestW))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("profile_lang"))
    // LEFT join back to the full corpus: a doc with no trigrams (short/empty
    // text) or no profile overlap must still classify — as 'und' — so every
    // document appears in the confusion matrix exactly once.
    docs.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .withColumn("lang_pred", coalesce(col("profile_lang"), lit("und")))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  /** Order-sensitive rolling-hash fingerprint: fold (acc*31 + len(t) +
    * first-char-code) mod 1e9+7 over the token stream. Same doc → same
    * fingerprint; any reorder/edit → different. */
  def qTextFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(lower(trim(col("text"))), " "))
      .withColumn("fingerprint", expr(
        """aggregate(transform(toks, t -> CAST(length(t) + ascii(t) AS BIGINT)),
          |  0L, (acc, v) -> (acc * 31 + v) % 1000000007)""".stripMargin))
      .select(col("doc_id"), col("fingerprint"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_tokens"      -> (qTextTokens _),
    "q_text_quality"     -> (qTextQuality _),
    "q_text_langid"       -> (qTextLangid _),
    "q_text_langid_ngram" -> (qTextLangidNgram _),
    "q_text_fingerprint" -> (qTextFingerprint _),
  )

  private val stopwordsSql = stopwords.map("'" + _ + "'").mkString(",")

  val oracle: Map[String, String] = Map(
    "q_text_tokens" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS token
        |      FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "q_text_quality" ->
      s"""WITH t AS (
        |  SELECT doc_id, n_chars, text,
        |         STRING_SPLIT(LOWER(TRIM(text)), ' ') AS toks FROM documents)
        |SELECT doc_id, n_chars,
        |       LEN(toks) AS n_tokens,
        |       LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_subtokens,
        |       ROUND(LIST_AGGREGATE(LIST_TRANSFORM(toks, t -> CAST(LENGTH(t) AS BIGINT)), 'sum')
        |         / CAST(LEN(toks) AS DOUBLE), 4) AS avg_token_len,
        |       ROUND(LEN(LIST_FILTER(toks, t -> t IN ($stopwordsSql)))
        |         / CAST(LEN(toks) AS DOUBLE), 4) AS stopword_ratio,
        |       ROUND(LEN(LIST_DISTINCT(toks)) / CAST(LEN(toks) AS DOUBLE), 4) AS distinct_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      s"""WITH t AS (
        |  SELECT lang, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS toks FROM documents),
        |scored AS (
        |  SELECT lang,
        |         CASE WHEN LEN(LIST_FILTER(toks, t -> t IN ($stopwordsSql)))
        |                   / CAST(LEN(toks) AS DOUBLE) >= 0.02
        |              THEN 'en' ELSE 'und' END AS lang_pred
        |  FROM t)
        |SELECT lang, lang_pred, COUNT(*) AS n
        |FROM scored GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin,
    "q_text_langid_ngram" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, SUBSTRING(text, 1, 200) AS head FROM documents),
        |tri AS (
        |  SELECT doc_id, lang, UNNEST(LIST_DISTINCT(
        |    CASE WHEN LENGTH(head) < 3 THEN []
        |    ELSE LIST_TRANSFORM(RANGE(1, LENGTH(head) - 1), i -> SUBSTRING(head, i, 3)) END)) AS trigram
        |  FROM docs),
        |prof AS (
        |  SELECT lang AS profile_lang, trigram,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, trigram) AS rk
        |  FROM tri GROUP BY lang, trigram),
        |profiles AS (
        |  SELECT profile_lang, trigram, 51 - rk AS weight FROM prof WHERE rk <= 50),
        |scored AS (
        |  SELECT doc_id, profile_lang, SUM(weight) AS score
        |  FROM tri JOIN profiles USING (trigram)
        |  GROUP BY doc_id, profile_lang),
        |best AS (
        |  SELECT doc_id, profile_lang,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang) AS rk
        |  FROM scored),
        |pred AS (
        |  SELECT d.doc_id, d.lang, COALESCE(b.profile_lang, 'und') AS lang_pred
        |  FROM docs d LEFT JOIN (SELECT doc_id, profile_lang FROM best WHERE rk = 1) b USING (doc_id))
        |SELECT lang, lang_pred, COUNT(*) AS n
        |FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |       LIST_REDUCE(
        |         LIST_PREPEND(CAST(0 AS BIGINT),
        |           LIST_TRANSFORM(STRING_SPLIT(LOWER(TRIM(text)), ' '),
        |             t -> CAST(LENGTH(t) +
        |                  CASE WHEN t = '' THEN 0 ELSE UNICODE(t) END AS BIGINT))),
        |         (acc, v) -> (acc * 31 + v) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
