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
  /** Per-document token statistics (token counting operator). */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens(col("text"))
    table(spark, sfDir, "documents").select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_uniq_tokens"),
      array_max(transform(t, x => length(x))).cast("long").as("max_token_len"),
      length(col("text")).cast("long").as("n_chars_calc"))
      .orderBy("doc_id")
  }

  def textStatsSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_uniq_tokens,
      |  CAST(list_max(list_transform(regexp_split_to_array(trim(text), '\s+'), x -> len(x))) AS BIGINT) AS max_token_len,
      |  CAST(length(text) AS BIGINT) AS n_chars_calc
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
