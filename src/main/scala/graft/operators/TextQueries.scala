package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.GraftSession.table
import graft.functions.TextFunctions._

/** Text-analysis operators for the training-data pipeline surface:
  * token statistics, quality scoring, language ID, document
  * fingerprinting. All pure column expressions over the `documents`
  * table — narrow, codegen'd, shuffle-free until the final small
  * aggregate, so they stream at scan speed over 100 TB.
  */
object TextQueries {

  /** Shared stopword lists — the SQL oracles interpolate these same
    * Scala values, so both engines score from identical lists.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "es" -> Seq("el", "los", "de", "y", "es", "en", "un", "una"),
    "fr" -> Seq("le", "les", "de", "et", "est", "un", "une", "dans"))

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  // ------------------------------------------------------- token stats
  /** GPT-2-style pretokenizer shape (simplified): letter runs, digit
    * runs, single punctuation marks — the "BPE-ish" piece count that
    * approximates subword-token budgets far better than whitespace
    * splitting on punctuation-heavy text. Same RE2/Java-compatible
    * pattern on both engines.
    */
  private val BpePieceRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Per-document token statistics (token counting operator). */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens(col("text"))
    table(spark, sfDir, "documents").select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_uniq_tokens"),
      array_max(transform(t, x => length(x))).cast("long").as("max_token_len"),
      length(col("text")).cast("long").as("n_chars_calc"),
      size(regexp_extract_all(col("text"), lit(BpePieceRe), lit(0)))
        .cast("long").as("n_bpe_pieces"))
      .orderBy("doc_id")
  }

  def textStatsSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_uniq_tokens,
       |  CAST(list_max(list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> len(x))) AS BIGINT) AS max_token_len,
       |  CAST(length(text) AS BIGINT) AS n_chars_calc,
       |  CAST(len(regexp_extract_all(text, '$BpePieceRe')) AS BIGINT) AS n_bpe_pieces
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- quality score
  /** Quality scoring: length band + stopword-density + repetition
    * filters, the standard pretraining-corpus heuristics. Ratios are
    * double divisions of exact integers — bit-identical across engines.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens(col("text"))
    val en = stopwords("en")
    val nTok = size(t).cast("long")
    val nStop = size(filter(t, x => x.isin(en: _*))).cast("long")
    val nUniq = size(array_distinct(t)).cast("long")
    table(spark, sfDir, "documents").select(
      col("doc_id"),
      nTok.as("n_tokens"),
      (nStop.cast("double") / nTok.cast("double")).as("stop_ratio"),
      (nUniq.cast("double") / nTok.cast("double")).as("uniq_ratio"))
      .withColumn("accept",
        col("n_tokens") >= 10 && col("n_tokens") <= 5000 &&
          col("uniq_ratio") > 0.1 && col("stop_ratio") < 0.9)
      .orderBy("doc_id")
  }

  def qualityScoreSql: String = {
    val en = sqlList(stopwords("en"))
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents)
       |SELECT doc_id,
       |  CAST(len(tk) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(tk, x -> list_contains($en, x))) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS stop_ratio,
       |  CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS uniq_ratio,
       |  (len(tk) >= 10 AND len(tk) <= 5000
       |    AND CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) > 0.1
       |    AND CAST(len(list_filter(tk, x -> list_contains($en, x))) AS DOUBLE) / CAST(len(tk) AS DOUBLE) < 0.9) AS accept
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------- lang id
  /** Language ID: distinct-stopword hit count per language, argmax with
    * fixed priority tie-break (en > de > es > fr > und). An n-gram
    * heuristic classifier — deterministic, dictionary-driven.
    */
  def langid(spark: SparkSession, sfDir: String): DataFrame = {
    val t = array_distinct(tokens(col("text")))
    def hits(l: String): Column =
      size(array_intersect(t, array(stopwords(l).map(lit): _*)))
    val scored = table(spark, sfDir, "documents").select(
      col("doc_id"),
      hits("en").as("s_en"), hits("de").as("s_de"),
      hits("es").as("s_es"), hits("fr").as("s_fr"))
    val best = greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr"))
    scored.withColumn("lang_pred",
      when(best === 0, "und")
        .when(col("s_en") === best, "en")
        .when(col("s_de") === best, "de")
        .when(col("s_es") === best, "es")
        .otherwise("fr"))
      .groupBy("lang_pred").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang_pred")
  }

  def langidSql: String = {
    def h(l: String) =
      s"len(list_intersect(list_distinct(regexp_split_to_array(trim(text), '\\s+')), ${sqlList(stopwords(l))}))"
    s"""WITH s AS (SELECT doc_id, ${h("en")} AS s_en, ${h("de")} AS s_de,
       |    ${h("es")} AS s_es, ${h("fr")} AS s_fr FROM documents),
       |p AS (SELECT doc_id, CASE
       |    WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
       |    WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
       |    WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
       |    WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
       |    ELSE 'fr' END AS lang_pred FROM s)
       |SELECT lang_pred, count(*) AS n_docs FROM p GROUP BY lang_pred ORDER BY lang_pred""".stripMargin
  }

  // ------------------------------------------------------- redaction
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII redaction: emails and IPv4 literals masked with typed
    * placeholders — the scrub pass every pretraining corpus runs. Pure
    * regexp_replace chain (narrow, codegen'd). The corpus has no PII,
    * so the query plants a deterministic email + IP per document and
    * must count and mask exactly those.
    */
  def redact(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = table(spark, sfDir, "documents").select(
      col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com from 10.0."), pmod(col("doc_id"), lit(256)),
        lit(".7")).as("text"))
    planted.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long")
        .as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).cast("long")
        .as("n_ips"),
      md5(regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>").cast("binary")).as("fp_redacted"))
      .orderBy("doc_id")
  }

  def redactSql: String =
    s"""WITH p AS (SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'
       |      || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  md5(regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g')) AS fp_redacted
       |FROM p ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ fingerprint
  /** Document fingerprinting: md5 over the whitespace-normalized,
    * lowercased text — the canonical form used by exact dedup.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents").select(
      col("doc_id"),
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary"))
        .as("fp"))
      .orderBy("doc_id")

  def fingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin
}
