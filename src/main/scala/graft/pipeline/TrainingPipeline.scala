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

  /** [[curate]] over span-scrubbed text: the duplicated-span scrub
    * REWRITES every document first, and the whole quality → dedup →
    * budget chain then runs on the rewritten corpus — the composition
    * no single-stage key exercises (every downstream stat — word
    * counts, fingerprints, token budgets — must reflect the scrubbed
    * text, not the original). Still one lazy plan. The scrub threshold
    * is CORPUS-RELATIVE (df > max(maxDf, N div docsPerDf), sklearn's
    * max_df-fraction semantics): an absolute df bound stops meaning
    * "boilerplate" the moment the corpus grows — at 10x replication it
    * scrubs every document to nothing and the whole pipeline output is
    * vacuously empty. */
  def curateScrubbed(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, budgetTokens: Long, k: Int = 5, maxDf: Int = 1,
      docsPerDf: Int = 500): DataFrame = {
    val scrubbed = TextAnalysis
      .scrubDuplicateSpans(docs, idCol, textCol, k, maxDf, docsPerDf)
      .select(col(idCol), col("scrubbed").as(textCol))
      .join(docs.select(col(idCol), col(strataCol)), Seq(idCol))
    curate(scrubbed, idCol, textCol, strataCol, budgetTokens)
  }

  /** [[curate]] with NEAR-duplicate removal in the dedup slot: the
    * MinHash → LSH → connected-components keeper chain (d16's algebra)
    * instead of exact fingerprints. Cluster evidence is computed over
    * the FULL corpus, deliberately: keeper decisions must not depend on
    * the quality filter, so near-dup identities stay stable as filter
    * thresholds evolve (and a near-duplicate of a LOW-quality document
    * is still recognized as a duplicate). Still one lazy plan. */
  def curateNearDup(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, budgetTokens: Long): DataFrame = {
    val keep = TextAnalysis.gopherRules(docs, idCol, textCol)
      .filter(col("keep")).select(col(idCol))
    val filtered = docs.join(keep, Seq(idCol), "left_semi")
    val clusters = Dedup.duplicateClusters(Dedup.lshCandidatePairs(
      Dedup.lshBands(Dedup.minhashSignatures(docs, idCol, textCol),
        idCol), idCol))
    val deduped = Dedup.dropNearDups(filtered, idCol, clusters)
    Dedup.tokenBudgetSample(deduped, idCol, textCol, strataCol,
      budgetTokens)
  }

  /** Per-stage curation lineage: the funnel report (docs and tokens
    * surviving each stage of the [[curate]] chain) every production
    * curation run logs next to its output — the number that makes a
    * silent over-aggressive filter VISIBLE before a training run
    * consumes the corpus. Stage frames are the same lazy fragments
    * [[curate]] composes (so the report can never disagree with the
    * pipeline), reduced by four 1-row aggregates; each stage re-derives
    * its chain prefix, the price of exact per-stage evidence — still
    * metadata-sized output from one action, and the stage reductions
    * are all map-side combined. */
  def curationLineage(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, budgetTokens: Long): DataFrame = {
    val nTok = size(TextAnalysis.tokens(col(textCol))).cast("long")
    def stat(stage: String, df: DataFrame, tokens: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(tokens), lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), col("n_docs"), col("n_tokens"))
    val keep = TextAnalysis.gopherRules(docs, idCol, textCol)
      .filter(col("keep")).select(col(idCol))
    val filtered = docs.join(keep, Seq(idCol), "left_semi")
    val deduped = Dedup.dropExactDups(filtered, idCol, textCol)
    val budgeted = Dedup.tokenBudgetSample(deduped, idCol, textCol,
      strataCol, budgetTokens)
    stat("0_raw", docs, nTok)
      .unionByName(stat("1_gopher", filtered, nTok))
      .unionByName(stat("2_dedup", deduped, nTok))
      .unionByName(stat("3_budget", budgeted, col("n_tokens")))
      .orderBy("stage")
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
        .orderBy("lang", "doc_id")),
    // p02: the same chain over span-scrubbed text — every downstream
    // stat must reflect the REWRITTEN corpus (a doc can pass Gopher on
    // its original text yet fail after losing boilerplate spans, and
    // token budgets count the scrubbed tokens)
    "p02_curation_scrub" -> ((s, dir) =>
      curateScrubbed(Tables.documents(s, dir), "doc_id", "text", "lang",
        budgetTokens = 1500)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
        .orderBy("lang", "doc_id")),
    // p07: the funnel report over p01's exact chain — stage counts
    // that can never disagree with the pipeline they describe
    "p07_curation_lineage" -> ((s, dir) =>
      curationLineage(Tables.documents(s, dir), "doc_id", "text",
        "lang", budgetTokens = 1500)),
    // p05: the near-dup variant — the realistic production chain
    // (filter → LSH keeper → budget); the oracle chains t12's filter,
    // d16's recursive closure, and d12's budget walk, so any
    // interaction bug between the three breaks the hash
    "p05_curation_neardup" -> ((s, dir) =>
      curateNearDup(Tables.documents(s, dir), "doc_id", "text", "lang",
        budgetTokens = 1500)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
        .orderBy("lang", "doc_id")))

  val oracle: Map[String, String] = Map(
    // the p01 chain's CTEs with four per-stage aggregates unioned
    "p07_curation_lineage" -> {
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
         |  FROM dd),
         |sel AS (SELECT * FROM c WHERE cum_tokens <= 1500),
         |s0 AS (SELECT '0_raw' AS stage, COUNT(*) AS n_docs,
         |         CAST(COALESCE(SUM(len(toks)), 0) AS BIGINT) AS n_tokens
         |       FROM t),
         |s1 AS (SELECT '1_gopher', COUNT(*),
         |         CAST(COALESCE(SUM(len(toks)), 0) AS BIGINT)
         |       FROM t JOIN g USING (doc_id)),
         |s2 AS (SELECT '2_dedup', COUNT(*),
         |         CAST(COALESCE(SUM(len(toks)), 0) AS BIGINT) FROM dd),
         |s3 AS (SELECT '3_budget', COUNT(*),
         |         CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM sel)
         |SELECT * FROM s0 UNION ALL SELECT * FROM s1
         |UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
         |ORDER BY stage""".stripMargin
    },
    // t12's filter, d16's recursive LSH closure (over the FULL corpus,
    // matching the engine's cluster-evidence design), d12's budget walk
    "p05_curation_neardup" -> {
      val toksSql = TextAnalysis.toksSql
      s"""WITH RECURSIVE ${Dedup.bandsCte},
         |pr AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |      FROM bands a JOIN bands b
         |        ON a.band = b.band AND a.bkey = b.bkey
         |      WHERE a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |          UNION SELECT id_b, id_a FROM pr),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
         |cl AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
         |t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
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
         |dd AS (SELECT t.doc_id, t.lang, t.toks
         |       FROM t JOIN g USING (doc_id)
         |       WHERE t.doc_id NOT IN
         |         (SELECT id FROM cl WHERE id <> cluster_id)),
         |c AS (SELECT doc_id, lang,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CAST(len(toks) AS BIGINT)) OVER (PARTITION BY lang
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM dd)
         |SELECT doc_id, lang, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= 1500
         |ORDER BY lang, doc_id""".stripMargin
    },
    "p02_curation_scrub" -> {
      val toksSql = TextAnalysis.toksSql
      s"""WITH t0 AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |g0 AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+4], ' ') AS gram
         |       FROM (SELECT doc_id, toks,
         |               unnest(generate_series(1, len(toks)-4)) AS i
         |             FROM t0 WHERE len(toks) >= 5)),
         |b0 AS (SELECT gram FROM g0 GROUP BY gram
         |       HAVING COUNT(DISTINCT doc_id) >
         |         greatest(1, (SELECT COUNT(*) FROM t0) // 500)),
         |s0 AS (SELECT doc_id, list(pos ORDER BY pos) AS starts
         |       FROM g0 JOIN b0 USING (gram) GROUP BY doc_id),
         |scrubbed AS (SELECT t0.doc_id, t0.lang,
         |        list_transform(
         |          list_filter(generate_series(1, len(toks)), j ->
         |            len(list_filter(COALESCE(s0.starts, []),
         |              st -> j >= st AND j < st + 5)) = 0),
         |          j -> toks[j]) AS toks
         |      FROM t0 LEFT JOIN s0 ON t0.doc_id = s0.doc_id),
         |t AS (SELECT doc_id, lang, toks FROM scrubbed),
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
    },
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
