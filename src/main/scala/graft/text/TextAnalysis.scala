package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY §2.7 [N]):
  * token counting, quality scoring, language-ID heuristic, and document
  * fingerprinting — the per-document scoring pass of a training-data
  * pipeline.
  *
  * Design for scale: every operator here is a narrow per-row projection —
  * no shuffle, no UDF, all codegen'd builtins (`split`, `filter`,
  * `aggregate`, `regexp_replace`, `md5`) — so at 100 TB it streams through
  * the parquet scan at I/O speed. The only shuffles are the final
  * deterministic ORDER BYs, which exist for oracle comparability, and the
  * small group-by in langid.
  *
  * Every computation is mirrored exactly in DuckDB SQL (see [[oracleSql]]);
  * ratios divide exact integer counts so doubles agree bitwise.
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  /** lower-cased, whitespace-collapsed text — the canonical form shared by
    * fingerprinting and dedup ([[graft.dedup.Dedup]]). */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** whitespace tokenization of the canonical form. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Stopword list shared with the DuckDB oracle (tiny, embedded in both). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "in", "and", "is")

  /** t01: token + char counting (whitespace tokenizer). */
  def t01TokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        length(col("text")).as("n_chars_actual"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  /** t02: per-document quality scoring — length, average token length,
    * stopword ratio, alphabetic ratio, and a weighted composite in [0,1]
    * (the reference gates batches on exactly such a score, SDP.py:413). */
  def t02Quality(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val sumLen = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
    val nStop = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double")
    val norm = normText(col("text"))
    // zero-length guard: Spark's non-ANSI divide yields NULL on /0 while
    // DuckDB yields NaN — pin empty documents to 0.0 in both engines
    val alpha = when(length(norm) === 0, 0.0).otherwise(
      length(regexp_replace(norm, "[^a-z ]", "")).cast("double") /
        length(norm).cast("double"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        nTok.cast("long").as("n_tokens"),
        round(sumLen / nTok, 6).as("avg_token_len"),
        round(nStop / nTok, 6).as("stop_ratio"),
        round(alpha, 6).as("alpha_ratio"),
        round(
          least(lit(1.0), nTok / 200.0) * 0.4 +
          (nStop / nTok) * 0.3 +
          alpha * 0.3, 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** t03: language-ID by marker-word counting (n-gram-free heuristic: count
    * hits from per-language marker lexicons, argmax with a deterministic
    * tie-break). The synthetic corpus is English-shaped, so the interesting
    * part is the machinery, which the oracle reproduces verbatim. */
  def t03LangId(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val en = size(filter(toks, t => t.isin("the", "a", "is", "of")))
    val es = size(filter(toks, t => t.isin("el", "la", "de", "que")))
    val de = size(filter(toks, t => t.isin("der", "die", "das", "und")))
    val pred = when(en >= es && en >= de && en > 0, "en")
      .when(es >= de && es > 0, "es")
      .when(de > 0, "de")
      .otherwise("und")
    Tables.documents(s, d)
      .select(col("lang"), pred.as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  /** t04: document fingerprinting — md5 over the canonical text form (the
    * exact-dedup key at corpus scale: fingerprint once, group by the 128-bit
    * digest instead of shuffling full document bodies). */
  def t04Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        md5(normText(col("text"))).as("fp"),
        length(normText(col("text"))).as("norm_len"))
      .orderBy(col("doc_id"))

  /** Subword ("BPE-ish") tokenizer regex: letter runs, digit runs, or a
    * single punctuation mark — the pre-merge alphabet a byte-pair
    * encoder starts from. Shared verbatim with the oracle. */
  val SubwordPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** t05: subword token counting — total and distinct subword counts per
    * document next to the whitespace count, the "tokens per doc" metric a
    * training-data pipeline budgets with. */
  def t05SubwordTokens(s: SparkSession, d: String): DataFrame = {
    val subs = regexp_extract_all(normText(col("text")), lit(SubwordPattern), lit(0))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        size(subs).as("n_subwords"),
        size(array_distinct(subs)).as("n_distinct_subwords"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "t01_token_count" -> t01TokenCount _,
    "t02_quality"     -> t02Quality _,
    "t03_langid"      -> t03LangId _,
    "t04_fingerprint" -> t04Fingerprint _,
    "t05_subword_tokens" -> t05SubwordTokens _,
  )

  /** Shared SQL fragments for the DuckDB oracle (public: the dedup
    * oracles MUST tokenize bit-identically to [[normText]]/[[tokens]],
    * so they reference these instead of re-inlining the regex). DuckDB's
    * regexp_replace needs the 'g' flag to match Spark's replace-all
    * default. */
  val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  val ToksSql = s"string_split($NormSql, ' ')"

  val oracleSql: Map[String, String] = Map(
    "t01_token_count" -> s"""
      SELECT doc_id, len($ToksSql) AS n_tokens,
             length(text) AS n_chars_actual, n_chars
      FROM documents ORDER BY doc_id""",
    "t02_quality" -> s"""
      WITH t AS (
        SELECT doc_id, $ToksSql AS toks, $NormSql AS norm FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(toks) AS DOUBLE) AS n_tok,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS sum_len,
               CAST(len(list_filter(toks, t ->
                 list_contains(['the','a','of','to','in','and','is'], t))) AS DOUBLE) AS n_stop,
               CASE WHEN length(norm) = 0 THEN 0.0
                    ELSE CAST(length(regexp_replace(norm, '[^a-z ]', '', 'g')) AS DOUBLE)
                         / CAST(length(norm) AS DOUBLE) END AS alpha
        FROM t)
      SELECT doc_id,
             CAST(n_tok AS BIGINT) AS n_tokens,
             round(sum_len / n_tok, 6) AS avg_token_len,
             round(n_stop / n_tok, 6) AS stop_ratio,
             round(alpha, 6) AS alpha_ratio,
             round(least(1.0, n_tok / 200.0) * 0.4 + (n_stop / n_tok) * 0.3
                   + alpha * 0.3, 6) AS quality
      FROM m ORDER BY doc_id""",
    "t03_langid" -> s"""
      WITH t AS (SELECT lang, $ToksSql AS toks FROM documents),
      m AS (
        SELECT lang,
          len(list_filter(toks, t -> list_contains(['the','a','is','of'], t))) AS en,
          len(list_filter(toks, t -> list_contains(['el','la','de','que'], t))) AS es,
          len(list_filter(toks, t -> list_contains(['der','die','das','und'], t))) AS de
        FROM t),
      p AS (
        SELECT lang,
          CASE WHEN en >= es AND en >= de AND en > 0 THEN 'en'
               WHEN es >= de AND es > 0 THEN 'es'
               WHEN de > 0 THEN 'de'
               ELSE 'und' END AS lang_pred
        FROM m)
      SELECT lang, lang_pred, count(*) AS n_docs
      FROM p GROUP BY lang, lang_pred ORDER BY lang, lang_pred""",
    "t04_fingerprint" -> s"""
      SELECT doc_id, md5($NormSql) AS fp, length($NormSql) AS norm_len
      FROM documents ORDER BY doc_id""",
    "t05_subword_tokens" -> s"""
      WITH t AS (
        SELECT doc_id, $ToksSql AS toks,
               regexp_extract_all($NormSql, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS subs
        FROM documents)
      SELECT doc_id, len(toks) AS n_ws_tokens,
             len(subs) AS n_subwords,
             len(list_distinct(subs)) AS n_distinct_subwords
      FROM t ORDER BY doc_id""",
  )
}
