package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** End-to-end corpus curation: the standard training-data shape
  * (quality-filter → dedup → per-domain token budget) composed from the
  * library's independently-oracled stages — the point this module
  * proves is COMPOSITION: the stages chain as lazy DataFrame
  * transformations into ONE Catalyst plan (no intermediate
  * materialization, no driver round-trips between stages), so a 100 TB
  * curation run is a single action whose stages pipeline through the
  * same scan where the optimizer allows it.
  *
  * Stage contracts (each verified on its own driver key):
  *  - Gopher document filters (`t12_gopher_rules`)
  *  - exact-duplicate drop, min-id representative (`d01_exact_dedup`'s
  *    fingerprint algebra via [[Dedup.dropExactDups]])
  *  - per-stratum token-budget walk (`d12_token_budget`)
  */
object TrainingPipeline {

  /** The curated corpus selection: documents that pass the Gopher
    * rules, survive exact dedup (min-id representative per normalized
    * content), and fit the per-stratum running token budget — with the
    * budget walk's evidence columns (n_tokens, cum_tokens). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, budgetTokens: Long): DataFrame = {
    val keep = TextAnalysis.gopherRules(docs, idCol, textCol)
      .filter(col("keep")).select(col(idCol))
    val filtered = docs.join(keep, Seq(idCol), "left_semi")
    val deduped = Dedup.dropExactDups(filtered, idCol, textCol)
    Dedup.tokenBudgetSample(deduped, idCol, textCol, strataCol,
      budgetTokens)
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // p01: the full curation pipeline on the documents table — the
    // oracle recomputes all three stages in one SQL chain, so any
    // stage interaction bug (e.g. dedup seeing pre-filter rows, or
    // the budget walk ordering by pre-dedup ids) breaks the hash
    "p01_curation" -> ((s, dir) =>
      curate(Tables.documents(s, dir), "doc_id", "text", "lang",
        budgetTokens = 1500)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
        .orderBy("lang", "doc_id")))

  val oracle: Map[String, String] = Map(
    "p01_curation" -> {
      val toksSql = TextAnalysis.toksSql
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  CASE WHEN len(toks) > 0 THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) ELSE 0.0 END AS mean_word_len,
         |  CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(toks) ELSE 0.0 END AS alpha_word_frac,
         |  CAST(${TextAnalysis.stopEnSql} AS BIGINT) AS n_stop_hits
         |  FROM t),
         |g AS (SELECT doc_id FROM f
         |      WHERE n_words >= 30 AND n_words <= 80
         |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |        AND alpha_word_frac >= 0.8
         |        AND n_stop_hits >= 2),
         |dd AS (SELECT doc_id, lang, toks FROM (
         |         SELECT t.*, row_number() OVER (
         |           PARTITION BY md5(array_to_string(toks, ' '))
         |           ORDER BY doc_id) AS rn
         |         FROM t JOIN g USING (doc_id)) WHERE rn = 1),
         |c AS (SELECT doc_id, lang,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CAST(len(toks) AS BIGINT)) OVER (PARTITION BY lang
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM dd)
         |SELECT doc_id, lang, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= 1500
         |ORDER BY lang, doc_id""".stripMargin
    })
}
