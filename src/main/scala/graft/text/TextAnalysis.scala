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
    // STRUCTURAL single evaluation: tokenizer and normalizer are
    // materialized once in their own projection, so every downstream
    // metric reads a bound attribute. The four metrics below would
    // otherwise each embed their own `split`/`regexp_replace` tree and
    // rely on codegen subexpression elimination to deduplicate them —
    // CollapseProject keeps this projection separate because the aliases
    // are multiply-referenced and non-cheap (pinned in PlanSpec: the
    // executed plan contains exactly one `split`). */
    val base = Tables.documents(s, d)
      .select(col("doc_id"), normText(col("text")).as("norm"))
      .select(col("doc_id"), col("norm"), split(col("norm"), " ").as("toks"))
    val toks = col("toks")
    val nTok = size(toks).cast("double")
    val sumLen = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
    val nStop = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double")
    val norm = col("norm")
    // zero-length guard: Spark's non-ANSI divide yields NULL on /0 while
    // DuckDB yields NaN — pin empty documents to 0.0 in both engines
    val alpha = when(length(norm) === 0, 0.0).otherwise(
      length(regexp_replace(norm, "[^a-z ]", "")).cast("double") /
        length(norm).cast("double"))
    base
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

  /** t28 core over an arbitrary documents frame (factored out so the
    * multi-script fixture spec can drive it without a parquet corpus). */
  def fertilityOf(docs: DataFrame): DataFrame = {
    val base = docs.select(col("lang"), normText(col("text")).as("norm"))
    base
      .select(col("lang"),
        size(split(col("norm"), " ")).as("nw"),
        size(regexp_extract_all(col("norm"), lit(SubwordPattern), lit(0)))
          .as("nsub"),
        octet_length(col("norm")).as("nb"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_ws_tokens"),
        sum(col("nsub")).as("n_subwords"),
        sum(col("nb")).as("n_bytes"))
      .withColumn("fertility_ppm",
        expr("(n_subwords * 1000000) div n_ws_tokens"))
      .withColumn("bytes_per_subword_ppm",
        when(col("n_subwords") === 0L, lit(null).cast("long"))
          .otherwise(expr("(n_bytes * 1000000) div n_subwords")))
      .orderBy(col("lang"))
  }

  /** t28: tokenizer-fertility audit — per-language subword fertility
    * (subword tokens per whitespace word, exact ppm) and byte economy
    * (bytes per subword token), the go/no-go metric before committing a
    * tokenizer to a multilingual corpus: a language whose fertility is
    * 2× another's costs 2× the training tokens for the same text volume.
    * All-integer outputs; one scan + one |langs|-row groupBy, fully
    * map-side combinable — at 100 TB this is a single pass with a
    * handful-of-rows result. On the driver corpus every lang is the same
    * ASCII soup so the measured fertilities are flat BY CORPUS (lang is
    * a label only) — the oracle still hash-checks the computation; the
    * SPREAD contract (≥ 1.5× across langs) is asserted in
    * RoundTwelveOpsSpec over a multi-script in-memory fixture
    * (CJK/Cyrillic per-char subwording), and scripts/gen_langmix.py
    * regenerates a parquet corpus for the cross-engine parity check of
    * this same row on non-ASCII text. */
  def t28TokenizerFertility(s: SparkSession, d: String): DataFrame =
    fertilityOf(Tables.documents(s, d))

  /** t06: TF-IDF keyword extraction — top 3 terms per document by
    * tf·ln(N/df), stopwords excluded, ties broken by term. The shape is
    * the scale story: term counts shuffle on (doc, term), the document
    * frequencies are a SMALL aggregate (vocabulary-sized) joined back,
    * and the corpus size enters as a broadcast single row — no pass ever
    * shuffles document bodies. */
  def t06Keywords(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(!col("term").isin(Stopwords: _*) && col("term") =!= "")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"),
        round(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Sentiment lexicons — tiny, embedded in engine and oracle alike (the
    * corpus vocabulary is database-flavored, so the lexicons are too). */
  val PositiveWords: Seq[String] = Seq("fast", "small", "merge")
  val NegativeWords: Seq[String] = Seq("slow", "big", "dup")

  /** t07: lexicon sentiment scoring — polarity = (pos−neg)/tokens with a
    * deterministic label, the classic pre-LLM document scorer (SURVEY
    * §2.7 [N] "sentiment/keyword scoring"). Narrow projection, zero
    * shuffles except the final ORDER BY. */
  def t07Sentiment(s: SparkSession, d: String): DataFrame = {
    // same structural single-evaluation as t02: tokenize once, score from
    // the bound attribute (polarity + label reference pos/neg repeatedly)
    val base = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val toks = col("toks")
    val nTok = size(toks).cast("double")
    val pos = size(filter(toks, t => t.isin(PositiveWords: _*)))
    val neg = size(filter(toks, t => t.isin(NegativeWords: _*)))
    val polarity = when(nTok === 0, 0.0)
      .otherwise((pos - neg).cast("double") / nTok)
    base
      .select(
        col("doc_id"),
        pos.cast("long").as("n_pos"),
        neg.cast("long").as("n_neg"),
        round(polarity, 6).as("polarity"),
        when(polarity > 0.01, "positive")
          .when(polarity < -0.01, "negative")
          .otherwise("neutral").as("label"))
      .orderBy(col("doc_id"))
  }

  /** Token budget per packed training batch (t08). */
  val PackBudget = 512

  /** t08: token-budget packing — the "pack documents into context
    * windows" pass of a training-data pipeline: within each source,
    * documents are packed greedily in doc_id order; a document's batch is
    * the budget-quotient of the tokens packed BEFORE it. (Greedy
    * sequential packing, the streaming form — an optimal bin packer is
    * NP-hard and needs global state; greedy-in-arrival-order is what a
    * pipeline actually runs.) One window cumsum per source partition +
    * the final rollup: shuffles (source, doc_id, n_tokens) triples only,
    * never text. */
  def t08TokenPack(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).as("n_tokens"))
      .withColumn("prior_tokens",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin",
        floor(col("prior_tokens") / PackBudget.toDouble).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("source"), col("bin"))
  }

  /** t09: redaction — mask every digit run as `<num>` (the PII-masking
    * mechanics over this corpus's only redactable tokens; real deployments
    * swap in email/phone/ssn patterns). Narrow per-row projection; the
    * redacted text is fingerprinted (md5) rather than returned, so the
    * oracle verifies CONTENT equality of the masked output without
    * hauling text through the compare. */
  def t09Redact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), normText(col("text")).as("norm"))
      .select(col("doc_id"), col("norm"),
        regexp_replace(col("norm"), "[0-9]+", "<num>").as("red"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("norm"), lit("[0-9]+"), lit(0))).as("n_nums"),
        md5(col("red")).as("redacted_fp"),
        length(col("red")).as("redacted_len"))
      .orderBy(col("doc_id"))

  /** t10 flag thresholds: a doc is `is_repetitive` past either bound —
    * the gate a Gopher-style quality filter applies before training. */
  val Dup3FracMax = 0.15
  val TopTokFracMax = 0.3

  /** t10: repetition signals (Gopher-style quality filters) — the
    * duplicate-n-gram and top-token-frequency fractions that catch
    * boilerplate and degenerate repetition in a pre-training corpus:
    *
    *  - `dup_2gram_frac` / `dup_3gram_frac`: 1 − distinct/total n-grams
    *    (token-count form of the published duplicate-n-gram filters),
    *  - `top_tok_frac`: most-frequent-token share of all tokens.
    *
    * The n-gram fractions are per-row array algebra on the scan (same
    * lambda-local zip_with construction as [[graft.dedup.Dedup.shingles]]
    * — nothing interpreted touches an outer expression). The top-token
    * mode needs a per-(doc, token) count, which no array builtin gives
    * without quadratic lambda re-evaluation, so it goes explode →
    * two-level aggregate: the first combines map-side to one row per
    * (doc, token) per partition, and since explode output is
    * doc-contiguous the shuffled volume is ~the distinct-token total,
    * never the corpus. The final join is doc_id-to-doc_id on two
    * derivations of the same scan. */
  def t10Repetition(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val toks = col("toks")
    val t2 = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    val bigrams = filter(
      zip_with(toks, t2, (a, b) => when(b.isNotNull, concat_ws(" ", a, b))),
      g => g.isNotNull)
    val arr = base.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      greatest(size(toks) - 1, lit(0)).cast("long").as("tot2"),
      size(array_distinct(bigrams)).cast("long").as("d2"),
      greatest(size(toks) - 2, lit(0)).cast("long").as("tot3"),
      size(graft.dedup.Dedup.shingles(toks)).cast("long").as("d3"))
    val mode = base
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
    val dup2 = when(col("tot2") === 0, 0.0)
      .otherwise(round((col("tot2") - col("d2")).cast("double") / col("tot2"), 6))
    val dup3 = when(col("tot3") === 0, 0.0)
      .otherwise(round((col("tot3") - col("d3")).cast("double") / col("tot3"), 6))
    val topFrac = when(col("n_tokens") === 0, 0.0)
      .otherwise(round(coalesce(col("top_cnt"), lit(0L)).cast("double") / col("n_tokens"), 6))
    arr.join(mode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        dup2.as("dup_2gram_frac"), dup3.as("dup_3gram_frac"),
        topFrac.as("top_tok_frac"),
        (dup3 > Dup3FracMax || topFrac > TopTokFracMax).as("is_repetitive"))
      .orderBy(col("doc_id"))
  }

  /** t11 geometry: top bigrams reported per language. */
  val NgramTopK = 5

  /** t11: per-language top-k bigram table — the corpus-profile n-gram
    * statistic every dataset card publishes. The bigram array is the same
    * lambda-local zip_with construction as [[t10Repetition]] (one
    * codegen'd pass on the scan, no quadratic lambda re-evaluation);
    * explode output is doc-contiguous, so the (lang, bigram) count
    * combines map-side before its ONE hash exchange, and only distinct
    * (lang, bigram, count) rows — bounded by vocabulary², not corpus
    * size — reach the per-lang top-k window. The window's per-lang sort
    * is over that aggregated frame (WindowGroupLimit prunes it to k per
    * lang before the final sort at scale). */
  def t11NgramTopK(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col("text"))
    val t2 = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    val bigrams = filter(
      zip_with(toks, t2, (a, b) => when(b.isNotNull, concat_ws(" ", a, b))),
      g => g.isNotNull)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("bigram"))
    Tables.documents(s, d)
      .select(col("lang"), explode(bigrams).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= NgramTopK)
      .select(col("lang"), col("rank"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rank"))
  }

  /** t12: Unicode NFC normalization at ingest — the canonicalization pass
    * that must precede any fingerprint/dedup (é as U+00E9 and as
    * e+U+0301 are different bytes, same text). Runs the native codegen'd
    * [[graft.functions.NfcNormalize]] expression (Spark has no builtin;
    * a UDF would leave whole-stage codegen). The corpus text is
    * synthetic ASCII, so the query plants a decomposed suffix on even
    * doc_ids and a precomposed one on odd ids — the oracle
    * (`nfc_normalize` in DuckDB) must agree that normalization composed
    * the former (length shrinks by 1) and fixed-pointed the latter,
    * and that both converge to the same final character.
    *
    * Scale: a narrow stateless projection on the scan; the
    * `isNormalized` fast path means near-zero cost on the (dominant)
    * already-canonical rows. */
  def t12Normalize(s: SparkSession, d: String): DataFrame = {
    import graft.functions.StringFunctions.nfc
    val aug = concat(col("text"),
      when(col("doc_id") % 2 === 0, lit("caf" + "e\u0301"))
        .otherwise(lit("caf\u00e9")))
    Tables.documents(s, d)
      .select(col("doc_id"), aug.as("aug"))
      .select(
        col("doc_id"),
        length(col("aug")).as("n_raw"),
        length(nfc(col("aug"))).as("n_nfc"),
        (length(nfc(col("aug"))) < length(col("aug"))).as("changed"),
        substring(nfc(col("aug")), -1, 1).as("last_char"))
      .orderBy(col("doc_id"))
  }

  /** t13 chunk geometry: 64-token windows advancing by 48 (16-token
    * overlap) — the context-window segmentation a training pipeline runs
    * between tokenization and packing. */
  val ChunkSize = 64
  val ChunkStride = 48

  /** t13: document chunking with overlap — split each document's token
    * stream into fixed-size windows ([[ChunkSize]] tokens, stride
    * [[ChunkStride]]), the segmentation pass that feeds embedding models
    * and context-window training. Each chunk carries its token count and
    * a content fingerprint (md5 of the re-joined tokens) so the oracle
    * verifies the exact chunk CONTENT without hauling text.
    *
    * Scale: tokenize once (structural single evaluation, same shape as
    * t02), then a per-row `sequence`→`transform`→`explode` — a generator
    * on the scan with no shuffle; chunk rows fan out ~n_tokens/stride per
    * document and never revisit the source text. The final ORDER BY
    * exists for oracle comparability only. */
  /** The chunk construction t13 explodes — window starts 1, 1+stride, …
    * (at least one chunk per document; `slice` clamps at the array end).
    * Shared with the overlap-law spec so the test exercises THIS
    * expression, not a copy. */
  def chunkArrays(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val starts = sequence(lit(1), greatest(size(toks), lit(1)), lit(ChunkStride))
    transform(starts, st => slice(toks, st, lit(ChunkSize)))
  }

  def t13Chunk(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val toks = col("toks")
    base
      .select(col("doc_id"), size(toks).as("n_tokens"),
        posexplode(chunkArrays(toks)).as(Seq("chunk_idx", "chunk")))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("chunk")).as("n_chunk_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** t14 document-frequency floor: a 3-gram appearing in ≥
    * max([[BoilerplateDocFreq]], ceil([[BoilerplateRelDf]] · n_docs))
    * documents counts as corpus-frequent ("boilerplate"). The RELATIVE
    * term is the load-bearing one (the C4/CCNet recipes threshold on
    * document frequency as a fraction of the corpus): an absolute cutoff
    * saturates as the corpus grows — measured here, df≥3 flags 29% of
    * shingle occurrences at 500 docs but 99.8% at 5 000 docs, which
    * made every doc "boilerplate" and passed the p16/p20 funnel zero
    * rows at sf0.1. The absolute floor only guards the small-corpus end
    * where ceil(0.5% · n) would count a 2-doc overlap as corpus-wide.
    * At the 50/500-doc test SFs both terms resolve to 3, so oracle rows
    * are bit-identical to the fixed-cutoff formulation. */
  val BoilerplateDocFreq = 3
  val BoilerplateRelDf = 0.005

  /** The df floor for a corpus of `nDocs` documents (Spark side). */
  def boilerplateFloor(nDocs: Long): Long =
    math.max(BoilerplateDocFreq.toLong, math.ceil(BoilerplateRelDf * nDocs).toLong)

  /** Same floor as a DuckDB scalar expression (oracle side) — single-
    * sourced here so t14's oracle and p16/p20's gate CTEs can't drift. */
  val BoilerFloorSql: String =
    s"greatest($BoilerplateDocFreq, CAST(ceil($BoilerplateRelDf * (SELECT count(*) FROM documents)) AS BIGINT))"

  /** t14: boilerplate detection — per-document fraction of word 3-grams
    * that are corpus-frequent (document frequency ≥
    * [[BoilerplateDocFreq]]). The filtering pass published pretraining
    * recipes (C4, CCNet, RefinedWeb) run to drop navigation chrome,
    * license headers, and templated text that exact/near dedup misses
    * because the surrounding document differs.
    *
    * Scale shape (same skeleton as d08 decontamination, but the probe set
    * is SELF-derived): shingles hash to 64 bits immediately, the
    * document-frequency count is one shuffle of (hash) with map-side
    * partials, and the frequent set — heavy hitters by construction, tiny
    * relative to the shingle universe — broadcasts back so the per-doc
    * scoring pass is a map-side probe on the scan.
    *
    * Both passes (df count + probe) read the SAME hashed-shingle frame,
    * materialized once with `localCheckpoint`: unlike caching the
    * array<string> shingle columns (measured ~50× worse than recompute —
    * see the d02 scaladoc), the checkpointed rows are three fixed-width
    * longs + nothing variable, so materializing beats re-running the
    * tokenize→shingle→hash projection twice (measured at sf0.1:
    * 1.47 s → 1.06 s). At cluster scale the same role is played by a
    * persisted (doc_id, n, h) intermediate table. */
  def t14Boilerplate(s: SparkSession, d: String): DataFrame = {
    // bounded scalar (parquet-metadata count) sizing the relative df
    // floor — the corpus-size read a production run does once per batch
    val dfFloor = boilerplateFloor(Tables.documents(s, d).count())
    // plain explode: docs with < 3 tokens have no shingles, produce no
    // rows, and are absent from the output — the same contract as the
    // oracle's unnest (p16's composition treats them as zero-boilerplate
    // via its left join)
    val hashed = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.ShingleFunctions.shingles3(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("sg"))
      .select(col("doc_id"), col("n_shingles"), xxhash64(col("sg")).as("h"))
      .localCheckpoint(eager = true)
    val freq = hashed
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= dfFloor)
      .select(col("h"), lit(1L).as("hit"))
    hashed
      .join(broadcast(freq), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("n_shingles")).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_frequent"))
      .select(col("doc_id"), col("n_shingles"), col("n_frequent"),
        round(col("n_frequent").cast("double") / col("n_shingles"), 6)
          .as("boiler_frac"))
      .orderBy(col("doc_id"))
  }

  /** t15: corpus-unigram language-model scoring — each document's mean
    * and minimum token log-probability under the corpus's own unigram
    * MLE distribution. The cheap stand-in for perplexity filtering
    * (CCNet-style): low avg_logp = rare-token-heavy gibberish, high
    * avg_logp = repetitive filler; min_logp flags the single rarest
    * token (OOV-ish spike detection).
    *
    * Scale shape: the LM itself is one (token → count) shuffle with
    * map-side partials and a scalar-total broadcast; scoring joins the
    * token stream to the LM on the token key. At test SF the LM side is
    * broadcast automatically; at 100 TB the vocabulary is Zipf-skewed and
    * too big to broadcast, so the scoring join is a shuffle join whose
    * head keys AQE's skew-join splitting handles — the alternative
    * (salting "the") is not needed because the joined payload per hot key
    * is 8 bytes of logp. Means aggregate exact doubles; the 6-dp rounding
    * matches the t06 TF-IDF precedent for cross-engine log comparability. */
  def t15UnigramLm(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val cnt = tok.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = cnt.agg(sum(col("c")).as("total"))
    val lm = cnt.crossJoin(broadcast(total))
      .select(col("term"), log(col("c").cast("double") / col("total")).as("logp"))
    tok.join(lm, "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("logp")), 6).as("avg_logp"),
        round(min(col("logp")), 6).as("min_logp"))
      .orderBy(col("doc_id"))
  }

  /** t16 hashed-feature space size: 3 hex digits of md5 → 4096 buckets.
    * DSIR's published configuration uses 10k hashed n-gram buckets; 4096
    * keeps the bucket id derivable from the same md5-prefix arithmetic
    * the oracle already shares ([[graft.functions.HashGate]] precedent)
    * while leaving ~15 tokens/bucket at sf0.01 — enough collisions to
    * exercise the hashing, not enough to wash out the signal. */
  val DsirBuckets = 4096

  /** t16's stand-in "target domain": English documents (the quality
    * corpus a real run would point at Wikipedia-like text). */
  val DsirTargetLang = "en"

  /** t16: DSIR-style importance weighting (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by the log-likelihood ratio of its hashed unigram
    * features under the TARGET distribution (here: the corpus's English
    * slice) vs the RAW distribution (the whole corpus), both with
    * add-one smoothing over the [[DsirBuckets]]-bucket feature space.
    * `selected` marks documents scoring above the corpus-mean log-ratio
    * ("more target-like than average") — the deterministic analogue of
    * DSIR's Gumbel-top-k resample (the noise draw is the one part of the
    * method that cannot be made engine-reproducible, so selection is
    * thresholded instead). An absolute `logw > 0` cut would be wrong:
    * add-one smoothing divides by the SMALLER target total, which biases
    * every shared-vocabulary token slightly negative, so the whole
    * corpus sits below zero and only the relative ordering carries the
    * signal.
    *
    * Scale shape: one (bucket → counts) shuffle with map-side partials —
    * the feature table is FIXED-WIDTH (≤ [[DsirBuckets]] rows) no matter
    * the corpus size, so the log-ratio side of the scoring join is always
    * broadcastable, and scoring itself is a map-side join + one keyed
    * aggregate on doc_id. Nothing grows with corpus size except the token
    * stream itself; at 100 TB this is exactly two passes over the scan.
    * The hashing (3-hex md5 prefix → int) is bit-identical in DuckDB, so
    * the oracle rebuilds the same feature space; log-ratio sums round to
    * 6 dp (the t06/t15 cross-engine precedent). */
  def t16DsirWeights(s: SparkSession, d: String): DataFrame = {
    val feat = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .select(col("doc_id"), col("lang"),
        conv(substring(md5(col("term")), 1, 3), 16, 10).cast("int").as("b"))
    val counts = feat.groupBy(col("b")).agg(
      count(lit(1)).as("raw_c"),
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("tgt_c"))
    val totals = counts.agg(sum(col("raw_c")).as("raw_total"),
      sum(col("tgt_c")).as("tgt_total"))
    val ratio = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("tgt_c") + 1).cast("double") /
             (col("tgt_total") + DsirBuckets).cast("double")) -
         log((col("raw_c") + 1).cast("double") /
             (col("raw_total") + DsirBuckets).cast("double"))).as("lr"))
    val scored = feat.join(broadcast(ratio), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), round(sum(col("lr")), 6).as("logw"))
    // selection threshold: the corpus mean of the ROUNDED weights (both
    // engines average identical 6-dp values, so the cut is reproducible)
    val mean = scored.agg(round(avg(col("logw")), 6).as("mean_logw"))
    scored.crossJoin(broadcast(mean))
      .select(col("doc_id"), col("n_tokens"), col("logw"),
        (col("logw") > col("mean_logw")).as("selected"))
      .orderBy(col("doc_id"))
  }

  /** t17 rule thresholds — the published Gopher bounds (Rae et al. 2021,
    * App. A1.1), verbatim where the corpus can express them. On this
    * single-line synthetic corpus the line-shape rules (bullet/ellipsis)
    * and the symbol rule pass trivially — the machinery is still exercised
    * end-to-end (real line splits, real token probes) and the word-count /
    * stopword rules do the discrimination (measured at sf0.01: word-count
    * quartiles 32-76 against the 50 floor; 317/500 docs clear the
    * 2-distinct-stopword gate). */
  val GopherMinWords = 50
  val GopherMaxWords = 100000
  val GopherMinStopwords = 2

  /** t17: the Gopher-style document-quality RULE battery — hard per-rule
    * gates (word-count bounds, mean-word-length band, alphabetic-word
    * fraction, symbol-to-word ratio, bullet/ellipsis line shares, distinct
    * required stopwords) with a conjunctive keep verdict. Distinct from
    * t02, which blends soft signals into one weighted score: production
    * curation stacks run BOTH — the rule battery as the cheap hard gate,
    * the score for ranking what survives (the reference gates batches on
    * quality thresholds the same way, SDP.py:413).
    *
    * Scale shape: one narrow projection over the scan — tokenizer and
    * line-splitter materialize once (t02's single-split idiom), every rule
    * reads the bound arrays, no shuffle but the oracle ORDER BY. All
    * integer-count ratios divide exactly in both engines. */
  def t17GopherRules(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"),
        split(col("text"), "\n").as("lines"))
    val toks = col("toks")
    val lines = col("lines")
    val nW = size(toks)
    val nL = size(lines)
    val sumLen = aggregate(toks, lit(0), (acc, t) => acc + length(t))
    val mwl = round(sumLen.cast("double") / nW.cast("double"), 6)
    val alphaFrac = round(
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
        nW.cast("double"), 6)
    val symRatio = round(
      size(filter(toks, t =>
        t.contains("#") || t.contains("...") || t.contains("…")))
        .cast("double") / nW.cast("double"), 6)
    val bulletFrac = round(
      size(filter(lines, l => trim(l).startsWith("-") ||
        trim(l).startsWith("*") || trim(l).startsWith("•")))
        .cast("double") / nL.cast("double"), 6)
    val ellipsisFrac = round(
      size(filter(lines, l => trim(l).endsWith("...") ||
        trim(l).endsWith("…"))).cast("double") / nL.cast("double"), 6)
    val nStop = size(array_distinct(filter(toks, t => t.isin(Stopwords: _*))))
    val rWords = nW.between(GopherMinWords, GopherMaxWords)
    val rMeanLen = mwl.between(3.0, 10.0)
    val rAlpha = alphaFrac >= 0.8
    val rSymbol = symRatio <= 0.1
    val rBullet = bulletFrac <= 0.9
    val rEllipsis = ellipsisFrac <= 0.3
    val rStop = nStop >= GopherMinStopwords
    base.select(
      col("doc_id"),
      nW.cast("long").as("n_words"),
      mwl.as("mean_word_len"),
      alphaFrac.as("alpha_frac"),
      symRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"),
      nStop.cast("long").as("n_stopwords"),
      rWords.as("r_words"),
      rMeanLen.as("r_mean_len"),
      rAlpha.as("r_alpha"),
      rSymbol.as("r_symbol"),
      rBullet.as("r_bullet"),
      rEllipsis.as("r_ellipsis"),
      rStop.as("r_stop"),
      (rWords && rMeanLen && rAlpha && rSymbol &&
        rBullet && rEllipsis && rStop).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** t18 weight-table stub scale: the 3-hex md5 bucket value spans
    * [0, 4095]; dividing by 2047.5 and shifting centers the pseudo-weights
    * on [−1, 1). */
  val ClfWeightScale = 2047.5

  /** t18: model-based quality scoring — the fastText-style hashed linear
    * classifier every current curation recipe ends with (DCLM's fastText
    * filter, FineWeb-Edu's classifier-score cut): hash each token into
    * t16's [[DsirBuckets]]-bucket feature space, mean-pool the per-bucket
    * weights, squash through a sigmoid, keep docs scoring ≥ 0.5.
    *
    * The WEIGHTS are a deterministic stub (md5-derived pseudo-randoms in
    * [−1, 1)): a trained weight VECTOR is not oracle-checkable, so this
    * row pins the scoring machinery with fixed weights while
    * [[t23TrainedClassifier]] covers the TRAINING path for real (MLlib
    * logistic regression, accuracy-contract oracle).
    * Everything a trained model would need is real and tested: the
    * feature hashing, the fixed-width weight table (≤ [[DsirBuckets]]
    * rows — always broadcastable, however big the corpus), the map-side
    * scoring join, the mean-pool aggregate, the sigmoid gate. Swapping
    * real weights in changes one `DataFrame` literal.
    *
    * Scale shape: ONE pass over the token stream — bucket projection,
    * broadcast join against the weight table, one doc_id-keyed aggregate.
    * Token-less documents have no feature rows and thus no score row, in
    * both engines. `keep` thresholds the ROUNDED score so the cut is
    * engine-stable at the boundary. */
  /** The hashed-linear-classifier scored frame shared by t18 and g38:
    * (doc_id, n_tokens, score), score = sigmoid of the mean hashed
    * token weight, rounded 6 dp (the rounding is the cross-engine
    * determinism seam — g38 bins the ROUNDED value). */
  private def hashedClfScored(s: SparkSession, d: String): DataFrame = {
    val weights = s.range(DsirBuckets.toLong)
      .select(col("id").cast("int").as("b"),
        (conv(substring(md5(concat(lit("clf"), col("id").cast("int"))), 1, 3),
          16, 10).cast("double") / ClfWeightScale - 1.0).as("w"))
    val feat = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .select(col("doc_id"),
        conv(substring(md5(col("term")), 1, 3), 16, 10).cast("int").as("b"))
    feat.join(broadcast(weights), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(sum(col("w")) / count(lit(1))))), 6).as("score"))
  }

  def t18Classifier(s: SparkSession, d: String): DataFrame =
    hashedClfScored(s, d)
      .select(col("doc_id"), col("n_tokens"), col("score"),
        (col("score") >= 0.5).as("keep"))
      .orderBy(col("doc_id"))

  /** g38: calibration audit (reliability diagram + ECE) of the hashed
    * classifier against a deterministic ground truth (lang = 'en') —
    * the model-quality check a data board runs before trusting a cheap
    * quality filter's scores as probabilities (Guo et al. '17). Scores
    * bin by decile of the 6-dp-ROUNDED sigmoid (both engines bin the
    * identical value, so bin edges cannot split between them); per bin
    * the row reports n, positives, and the exact integer gap
    * n·|mean_pred − obs_rate|·1e6 = |Σ score_micros − n_pos·1e6| — no
    * division ever happens, so there is no accumulation-order FP to
    * drift. The bin = −1 row is the corpus rollup whose gap_micros is
    * ECE·N·1e6 (the sum of per-bin gaps, not the gap of sums).
    *
    * Scale: one token-explode scan (the t18 pipeline), a ≤10-key
    * aggregate, and a 10-row rollup — nothing beyond t18's cost. */
  def g38Calibration(s: SparkSession, d: String): DataFrame = {
    val truth = Tables.documents(s, d)
      .select(col("doc_id"), (col("lang") === "en").as("y"))
    val scored = hashedClfScored(s, d).join(truth, "doc_id")
      .select(least(floor(col("score") * 10).cast("long"), lit(9L)).as("bin"),
        round(col("score") * 1000000).cast("long").as("score_micros"),
        col("y").cast("long").as("pos"))
    val bins = scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("score_micros")).as("sum_score_micros"))
      .withColumn("gap_micros",
        abs(col("sum_score_micros") - col("n_pos") * 1000000L))
    val total = bins.agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"),
        sum(col("sum_score_micros")).as("sum_score_micros"),
        sum(col("gap_micros")).as("gap_micros"))
      .select(lit(-1L).as("bin"), col("n"), col("n_pos"),
        col("sum_score_micros"), col("gap_micros"))
    bins.unionByName(total).orderBy(col("bin"))
  }

  /** t19 low-entropy gate: a doc whose character distribution carries
    * less than this many nats is keyboard-mash / repeated-filler, not
    * prose (English prose sits near 3.0; "aaaa…" is 0). */
  val MinCharEntropy = 2.0

  /** t19: character-entropy gibberish screen — per-document Shannon
    * entropy of the CHARACTER distribution over the canonical text, the
    * compression-proxy quality signal (cheap stand-in for the gzip-ratio
    * filter in published pipelines: low char entropy ⇔ highly
    * compressible ⇔ repeated filler; the failure mode token-level rules
    * like t10's repetition fractions miss when the repetition is
    * sub-token). Entropy via the same H = ln n − Σ c·ln c / n identity
    * as g09, folded into ONE aggregate.
    *
    * Scale shape: the char explode fans out map-side on the scan (same
    * volume argument as g09's token stream), partial counts reduce each
    * partition to ≤ alphabet-size rows per doc before the one
    * (doc_id, ch) exchange; everything downstream is per-doc arithmetic
    * over ≤ alphabet-size count rows. Text itself never shuffles. */
  def t19CharEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(normText(col("text")), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        round(log(sum(col("c")).cast("double")) -
          sum(col("c") * log(col("c").cast("double"))) / sum(col("c")), 6)
          .as("char_entropy"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        col("char_entropy"),
        (col("char_entropy") < MinCharEntropy).as("low_entropy"))
      .orderBy(col("doc_id"))

  /** t20: Flesch reading-ease proxy — the classic readability signal
    * (words-per-sentence + syllables-per-word), the complexity
    * counterpart of t02's surface-quality score: templated SEO sludge
    * reads "too easy", machine-generated run-ons read "too hard", and
    * curation recipes band on it. Syllables are approximated as vowel
    * GROUPS per token (min 1 — CJK tokens count 1, the standard latin
    * approximation degrades gracefully); sentences as terminal-punct
    * runs (min 1 — this corpus has none, so the whole doc is one
    * sentence and the words/sentence term measures doc length, which is
    * exactly what Flesch does to unpunctuated text).
    *
    * Scale shape: pure per-row projection — the tokenizer materializes
    * once, the syllable sum is a higher-order fold over the token array,
    * no shuffle but the output sort. Both engines compute the identical
    * literal formula on exact integer counts, so round(·,4) agrees
    * bitwise. */
  def t20Readability(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val sylls = aggregate(
      transform(toks, w =>
        greatest(lit(1L), regexp_count(w, lit("[aeiouy]+")).cast("long"))),
      lit(0L), (a, x) => a + x)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_words"),
        sylls.as("n_sylls"),
        greatest(lit(1L), regexp_count(col("text"), lit("[.!?]")).cast("long"))
          .as("n_sents"))
      .withColumn("flesch",
        round(lit(206.835)
          - lit(1.015) * (col("n_words") * lit(1.0) / col("n_sents"))
          - lit(84.6) * (col("n_sylls") * lit(1.0) / col("n_words")), 4))
      .orderBy(col("doc_id"))
  }

  /** t21: bigram-LM scoring — the next LM order up from t15's unigram:
    * per-doc mean/min log p(w2|w1) under the corpus's own add-one-
    * smoothed bigram MLE, p = (c(w1 w2)+1)/(c(w1)+V). The closest
    * self-contained analogue of the KenLM-perplexity filter published
    * pipelines gate on (an external LM is just a pre-built version of
    * the same count tables): word-salad with plausible unigrams but
    * impossible transitions — the failure t15 cannot see — scores low
    * here.
    *
    * Scale shape: bigram construction is per-row array algebra on the
    * scan (no positional self-join); the count tables are one (w1, bg)
    * shuffle + one term shuffle; V is a scalar broadcast. The scoring
    * join keys on the bigram string — broadcastable at test SF, an
    * AQE-salvageable shuffle join at corpus scale (t15's argument, one
    * order higher); published recipes train the LM on a fixed slice
    * precisely so this side stays broadcastable. */
  def t21BigramLm(s: SparkSession, d: String): DataFrame = {
    val toksArr = filter(tokens(col("text")), w => w =!= "")
    val docs = Tables.documents(s, d).select(col("doc_id"), toksArr.as("tk"))
    val big = docs
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - 1),
        i => struct(
          element_at(col("tk"), i).as("w1"),
          concat_ws(" ", element_at(col("tk"), i),
            element_at(col("tk"), i + 1)).as("bg")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.bg").as("bg"))
    val uni = docs.select(explode(col("tk")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val lm = big.groupBy(col("w1"), col("bg")).agg(count(lit(1)).as("cbg"))
      .join(uni.select(col("term").as("w1"), col("cu")), "w1")
      .crossJoin(broadcast(vocab))
      .select(col("bg"),
        log((col("cbg") + 1) * lit(1.0) / (col("cu") + col("v"))).as("logp"))
    big.join(lm, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 6).as("avg_logp"),
        round(min(col("logp")), 6).as("min_logp"))
      .orderBy(col("doc_id"))
  }

  /** t22 PII patterns — shared literal text between engines (Java regex
    * and DuckDB's RE2 agree on this subset: char classes, bounded
    * repetition, escaped metacharacters; no lookaround, no backrefs). */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[a-z]{2,}"
  val PiiPhoneRe = "\\+1-555-[0-9]{4}"
  val PiiIpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** t22: PII detection + masking — the real-pattern version of t09's
    * digit-run mechanics (t09's scaladoc: "real deployments swap in
    * email/phone/ssn patterns" — this row does). The corpus text carries
    * no contact strings, so the row first derives a release view from
    * the events table — contact lines synthesized deterministically from
    * (user_id, event_id, props) with IDENTICAL expressions in both
    * engines (the d14/st* derive-your-feed precedent) — then runs the
    * actual operator: detect emails/phones/IPv4s, mask each class with a
    * typed token, and prove the masked CONTENT (not just counts) via an
    * order-free sum of per-line md5-prefix integers.
    *
    * Scale shape: pure per-row projection on the scan (regexes are
    * codegen'd string ops, no UDF), one event_type-keyed aggregate;
    * nothing but the 5-row rollup crosses the exchange. Masking order is
    * fixed (email → phone → ip) and the three patterns are mutually
    * non-overlapping on this grammar, so the composition is confluent. */
  def t22PiiScan(s: SparkSession, d: String): DataFrame = {
    val line = concat(
      lit("uid="), col("user_id").cast("string"),
      lit(" mail=u"), col("user_id").cast("string"),
      lit("@ex"), pmod(col("user_id"), lit(7)).cast("string"), lit(".example"),
      lit(" phone=+1-555-"),
      lpad(pmod(col("event_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" ip=10."), pmod(col("user_id"), lit(256)).cast("string"),
      lit("."), pmod(col("event_id"), lit(256)).cast("string"), lit(".7"),
      lit(" props="), col("props"))
    // Mask once, count the masks: each pattern's occurrence count is read
    // off its own replace output (split on the literal mask token) instead
    // of a separate regexp_extract_all pass — 3 regex evaluations per row,
    // not 6 (measured 2.22 → 1.55 s at sf0.1; results identical). Codegen
    // CSE shares each replace between the chain and its count. Counting
    // masks also guarantees count ≡ masks-applied by construction. The
    // mask literals cannot collide: later patterns are all-digit shapes
    // that can't match inside "<email>"/"<phone>", and the corpus line
    // carries no literal mask tokens (spec-pinned for the gated feed).
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), line.as("line"))
      .withColumn("e1", regexp_replace(col("line"), PiiEmailRe, "<email>"))
      .withColumn("e2", regexp_replace(col("e1"), PiiPhoneRe, "<phone>"))
      .withColumn("masked", regexp_replace(col("e2"), PiiIpRe, "<ip>"))
      .select(col("event_type"),
        (size(split(col("e1"), "<email>", -1)) - 1).as("ne"),
        (size(split(col("e2"), "<phone>", -1)) - 1).as("np"),
        (size(split(col("masked"), "<ip>", -1)) - 1).as("ni"),
        col("masked"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("ne")).cast("long").as("n_emails"),
        sum(col("np")).cast("long").as("n_phones"),
        sum(col("ni")).cast("long").as("n_ips"),
        countDistinct(col("masked")).as("n_masked_distinct"),
        sum(conv(substring(md5(col("masked")), 1, 8), 16, 10).cast("long"))
          .as("mask_sum"),
        sum(length(col("masked"))).cast("long").as("masked_len"))
      .orderBy(col("event_type"))
  }

  /** g14 sketch geometry: eps fixes the CMS width (2/eps counters per
    * row) and the overcount bound (≤ eps·N w.p. ≥ confidence); the seed
    * makes the hash family — and so every estimate — deterministic. */
  val CmsEps = 1e-4
  val CmsConfidence = 0.99
  val CmsSeed = 42
  val HeavyK = 15

  /** g14: heavy hitters via count-min sketch — the fixed-memory
    * frequency-profile pass a 100 TB pipeline runs where an exact
    * (term → count) table would itself be corpus-scale: the CMS is a
    * few-KB array regardless of vocabulary (width 2/eps × depth
    * ln(1/(1−conf))), merges associatively across partitions (Spark's
    * `stat.countMinSketch` aggregates it distributed, merge-by-+ per
    * executor), and guarantees est ≥ true always and est ≤ true + eps·N
    * with probability ≥ confidence.
    *
    * The row pins both guarantees on the exact top-[[HeavyK]] terms:
    * true counts are oracle-computable (DuckDB ranks the same tokens),
    * and the booleans assert the sketch's contract. Driver materializes
    * only the sketch (bounded by construction) and [[HeavyK]] ranked
    * rows — the d13-codebook/bounded-collect precedent; token explode,
    * counting, and the sketch aggregation are all distributed. */
  def g14HeavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(filter(tokens(col("text")), w => w =!= "")).as("term"))
    val sketch = toks.stat.countMinSketch("term", CmsEps, CmsConfidence, CmsSeed)
    // N for the eps·N bound comes from the sketch itself — a separate
    // count() would re-tokenize the whole corpus for a number the sketch
    // pass already accumulated
    val slack = math.ceil(CmsEps * sketch.totalCount()).toLong
    val top = toks.groupBy(col("term")).agg(count(lit(1)).as("true_n"))
      .orderBy(col("true_n").desc, col("term")).limit(HeavyK)
      .collect()
    val rows = top.map { r =>
      val term = r.getString(0); val tn = r.getLong(1)
      val est = sketch.estimateCount(term)
      (term, tn, est >= tn, est <= tn + slack)
    }.toSeq
    // an empty corpus yields zero ranked rows, and createDataFrame cannot
    // infer a schema from an empty tuple Seq (the g13 single-centroid
    // guard precedent) — build against an explicit schema instead of
    // throwing at plan time
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("term", StringType), StructField("true_n", LongType),
      StructField("overcount_ok", BooleanType), StructField("bound_ok", BooleanType)))
    s.createDataFrame(
        rows.map(t => org.apache.spark.sql.Row(t._1, t._2, t._3, t._4)).asJava,
        schema)
      .orderBy(col("true_n").desc, col("term"))
  }

  /** g16 drift geometry: 10 equal-width score bins over [0,1]; 0.5-per-bin
    * Laplace smoothing keeps ln finite on empty cells; PSI > 0.2 is the
    * standard "significant shift" threshold in production monitoring. */
  val PsiBins = 10
  val PsiDriftMax = 0.2

  /** g16: per-source quality-drift panel via PSI (population stability
    * index — the standard production-ML input-drift metric): for each
    * source, compare its t02 quality-score distribution against the whole
    * corpus over [[PsiBins]] fixed-width bins,
    * PSI = Σ_b (p_src − p_corpus)·ln(p_src / p_corpus), smoothed. This is
    * the monitoring read run on every incoming crawl batch — a drifted
    * source (PSI > [[PsiDriftMax]]) gets its mixture weight re-examined
    * before it silently shifts the training distribution.
    *
    * Scale shape: scores reduce to (source, bin) counts on the scan (the
    * t02 projection + one keyed aggregate); everything downstream runs
    * over the #sources×[[PsiBins]] dense grid (explode over a literal
    * sequence — missing cells must still contribute their smoothed mass),
    * with corpus bin masses joined from a [[PsiBins]]-row broadcast. The
    * ln-sum rounds to 6 dp over exactly [[PsiBins]] terms (the t15/t21
    * log-arithmetic precedent). */
  def g16QualityPsi(s: SparkSession, d: String): DataFrame = {
    // the t02 composite, same expression tree (bitwise-equal scores)
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), normText(col("text")).as("norm"))
      .select(col("doc_id"), col("source"), col("norm"),
        split(col("norm"), " ").as("toks"))
    val toks = col("toks")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double")
    val alpha = when(length(col("norm")) === 0, 0.0).otherwise(
      length(regexp_replace(col("norm"), "[^a-z ]", "")).cast("double") /
        length(col("norm")).cast("double"))
    val quality = round(
      least(lit(1.0), nTok / 200.0) * 0.4 + (nStop / nTok) * 0.3 + alpha * 0.3, 6)
    val binned = base
      .select(col("source"),
        least(floor(quality * PsiBins), lit(PsiBins - 1)).cast("int").as("bin"))
    val counts = binned.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n"))
    // dense (source × bin) grid: absent cells still carry smoothed mass
    val grid = counts.select(col("source")).distinct()
      .select(col("source"),
        explode(sequence(lit(0), lit(PsiBins - 1))).as("bin"))
    val dense = grid.join(counts, Seq("source", "bin"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val srcTot = dense.groupBy(col("source")).agg(sum(col("n")).as("n_src"))
    val corpBin = dense.groupBy(col("bin")).agg(sum(col("n")).as("n_bin"))
    val corpTot = dense.agg(sum(col("n")).as("n_all"))
    val ps = (col("n") + 0.5) / (col("n_src") + 0.5 * PsiBins)
    val pc = (col("n_bin") + 0.5) / (col("n_all") + 0.5 * PsiBins)
    dense
      .join(srcTot, "source")
      .join(broadcast(corpBin), "bin")
      .crossJoin(broadcast(corpTot))
      .select(col("source"), col("n_src"), ((ps - pc) * log(ps / pc)).as("c"))
      .groupBy(col("source"), col("n_src"))
      .agg(round(sum(col("c")), 6).as("psi"))
      .select(col("source"), col("n_src").as("n_docs"), col("psi"),
        (col("psi") > PsiDriftMax).as("drifted"))
      .orderBy(col("source"))
  }

  /** t23 label hyperplane threshold (the corpus margin median — splits
    * ~50/50 at every SF) and test-split gate (~20 %). */
  val TrainedClfThreshold = 13.9
  val TrainedClfTestGateHex = "33"

  /** t23: a TRAINED quality classifier through the real distributed
    * training path — the half t18 deliberately stubs (t18 scores with
    * fixed hashed weights because a trained weight VECTOR isn't
    * oracle-checkable; this row trains for real and pins what IS
    * checkable). MLlib `LogisticRegression` fits on the train split —
    * each LBFGS iteration is one treeAggregate gradient pass over the
    * executors, the shape distributed training takes at corpus scale —
    * and the learned model scores both splits.
    *
    * The label is a KNOWN hyperplane over the two features fed to the
    * model (alpha-density ×10 + ln(1+chars) > median), so the learning
    * problem is linearly separable by construction and a correct
    * training path recovers ≥90 % held-out accuracy with a wide margin
    * (observed ≈99 %; the band absorbs LBFGS's summation-order jitter).
    * The oracle restates the split accounting and the label counts
    * exactly (md5 gate + the same margin arithmetic) and carries the
    * accuracy contract as the g07-style TRUE band. */
  def t23TrainedClassifier(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val labeled = Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        (length(regexp_replace(col("text"), "[^A-Za-z]", "")) * lit(10.0)
          / length(col("text"))).as("f_alpha"),
        log(lit(1.0) + length(col("text"))).as("f_len"))
      .withColumn("label",
        ((col("f_alpha") + col("f_len")) > TrainedClfThreshold).cast("double"))
      .withColumn("is_test",
        graft.functions.HashGate(col("doc_id"), TrainedClfTestGateHex))
      .withColumn("features", array_to_vector(array(col("f_alpha"), col("f_len"))))
    val model = new LogisticRegression()
      .setMaxIter(100).setRegParam(0.0)
      .fit(labeled.filter(!col("is_test")))
    model.transform(labeled)
      .groupBy(when(col("is_test"), "test").otherwise("train").as("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("label")).cast("long").as("n_pos"),
        (sum(when(col("prediction") === col("label"), 1L).otherwise(0L))
          >= count(lit(1)) * lit(0.9)).as("acc_ok"))
      .orderBy(col("split"))
  }

  /** Fixed hashed-feature dimensionality for t24 (the classic 2^k). */
  val FeatureHashBuckets = 256

  /** t24: the hashing-trick featurizer (Weinberger et al. 2009) — every
    * token maps to one of [[FeatureHashBuckets]] buckets via the first
    * four hex digits of md5(term) (the [[graft.functions.HashGate]]
    * engine-portable hash family), and the corpus-level hashed feature
    * matrix is summarized per bucket: term frequency, document
    * frequency, and the number of DISTINCT terms sharing the bucket —
    * the collision count that is the trick's only cost, made a visible,
    * oracle-checked output rather than folklore. This is the
    * featurization that feeds fixed-width models (t23's trainer) without
    * a vocabulary pass: no vocab table to build, broadcast, or version.
    *
    * Scale: one scan → explode → hash → one aggregate on a key space
    * FIXED at [[FeatureHashBuckets]] regardless of corpus size (the
    * whole point of the trick: the shuffle key cardinality is a
    * constant, so partial aggregation collapses everything map-side);
    * the two distinct-counts ride the same Expand pass. No vocabulary
    * state anywhere. */
  def t24FeatureHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .withColumn("bucket",
        (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("int")
          % FeatureHashBuckets))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("df"),
        countDistinct(col("term")).as("n_terms"))
      .orderBy(col("bucket"))

  /** t25 ladder: each rung covers the doc_id prefix `[0, (max+1) div
    * denom)` — 1/16th of the corpus up to all of it. */
  val VocabRungDenoms: Seq[Long] = Seq(16L, 8L, 4L, 2L, 1L)

  /** t25: the vocabulary-growth (Heaps'-law) census — distinct-term
    * count, token mass, type-token ratio, and NEW terms per corpus
    * prefix rung. The curve a corpus curator reads before sizing a
    * tokenizer vocabulary or a hashed feature width (t24's bucket
    * count): sublinear growth says the vocabulary is saturating;
    * near-linear growth says the corpus is still surfacing new types
    * (or is noise-heavy — g09's Zipf head is the companion view of the
    * same distribution). "First N docs" is by `doc_id` order, the
    * corpus's ingest order.
    *
    * Determinism: rungs are integer prefixes of the id space
    * ((max+1) div denom); a term belongs to a rung iff its FIRST
    * occurrence (min doc_id — an exact term-keyed aggregate) falls in
    * the prefix; ratios are integer ppm. Docs with zero non-empty
    * tokens count in no rung's n_docs (stated, and matched by the
    * oracle).
    *
    * Scale: one explode pass → a term-keyed min aggregate (vocabulary-
    * bounded, the t15 frame) and a doc-keyed count; the ladder is a
    * constant ×|rungs| broadcast expand over those AGGREGATED frames
    * (g25's idiom), never over the corpus; the final new-terms lag
    * rides a |rungs|-row window. */
  def t25VocabGrowth(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rungs = Tables.documents(s, d).agg(max(col("doc_id")).as("mx"))
      .select(explode(array(VocabRungDenoms.map(lit): _*)).as("denom"),
        col("mx"))
      .select(col("denom"), expr("(mx + 1) div denom").as("cut"))
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val vocab = toks.groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(rungs)).filter(col("fd") < col("cut"))
      .groupBy(col("cut")).agg(count(lit(1)).as("vocab"))
    val dstats = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
      .crossJoin(broadcast(rungs)).filter(col("doc_id") < col("cut"))
      .groupBy(col("cut"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val wr = Window.orderBy(col("cut"))
    dstats.join(vocab, Seq("cut"))
      .withColumn("new_terms",
        col("vocab") - coalesce(lag(col("vocab"), 1).over(wr), lit(0L)))
      .select(col("cut"), col("n_docs"), col("n_tokens"), col("vocab"),
        col("new_terms"),
        expr("(vocab * 1000000) div n_tokens").as("ttr_ppm"))
      .orderBy(col("cut"))
  }

  /** t26 output depth: the merge-candidate table a tokenizer trainer
    * reads top-down. */
  val BpeTopPairs = 20

  /** t26: the BPE first-merge census — corpus-wide counts of adjacent
    * character pairs within words, ranked: exactly the statistic the
    * first iteration of byte-pair-encoding tokenizer training (Sennrich
    * et al. '16) maximizes over, exposed as the merge-candidate table.
    * The companion read to t25's vocabulary curve (t25 says whether the
    * vocab is saturating; this says WHICH merges a subword tokenizer
    * trained on this corpus would learn first, and how concentrated the
    * pair mass is). Simplification stated: no end-of-word marker symbol
    * — pairs are interior to whitespace tokens ([[tokens]], the shared
    * tokenizer), which is the marker-free BPE variant.
    *
    * Scale: the corpus collapses to the (word, count) VOCABULARY frame
    * first — the pair explosion and everything after it run over
    * vocab-bounded rows, never corpus tokens (the t15 frame argument);
    * pair counts aggregate over ≤ charset² keys, and the final ranking
    * window orders that bounded frame, not data. Occurrence counts
    * weight by word frequency (sum(n), not distinct words). */
  def t26BpePairs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .filter(length(col("word")) >= 2)
    val w = Window.orderBy(col("n_pairs").desc, col("pair"))
    vocab
      .withColumn("i", explode(sequence(lit(1), length(col("word")) - 1)))
      .select(expr("substring(word, i, 2)").as("pair"), col("n"))
      .groupBy(col("pair")).agg(sum(col("n")).as("n_pairs"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= BpeTopPairs)
      .select(col("rank"), col("pair"), col("n_pairs"))
      .orderBy(col("rank"))
  }

  /** t27 candidate vocabulary sizes (the ladder a tokenizer designer
    * sweeps). */
  val OovVocabSizes: Seq[Long] = Seq(256L, 512L, 1024L, 2048L, 4096L)

  /** t27: the OOV-rate ladder — for each candidate vocabulary size V,
    * the share of corpus tokens NOT covered by the top-V terms (by
    * count desc, term asc). Closes the tokenizer-design trilogy: t25
    * says whether the vocabulary is still growing, t26 says which
    * subword merges training would learn first, and this says what a
    * WORD-level vocabulary of size V would leave out-of-vocabulary —
    * the coverage/size trade curve read before committing a vocab
    * budget. Everything is exact integers: term counts, rank by
    * (count desc, term), in-vocab token mass per rung, oov ppm by
    * integer division.
    *
    * Scale: one explode pass → the vocabulary-bounded count frame (the
    * t15 argument); the rank-≤-max(V) cut prunes as a rank window over
    * that frame (WindowGroupLimit keeps O(maxV) per map task), the
    * ladder is a constant ×|rungs| expand over the ≤ maxV surviving
    * rows (g25's idiom), and the scalar token total broadcasts back.
    * The corpus is never ranked — only the vocabulary is. */
  def t27OovLadder(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the count frame feeds BOTH the scalar total and the ranked ladder:
    // eagerly localCheckpoint the vocabulary-bounded aggregate so the
    // corpus explode pass runs once (the g22 edges precedent — pin the
    // small frame, never the corpus). localCheckpoint instead of
    // persist(): no CacheManager entry, so the blocks are released by
    // the ContextCleaner once the result frame is dropped — a 214-query
    // driver session no longer accumulates one cached frame per call.
    val counts = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val totals = counts.agg(sum(col("c")).as("total_tokens"))
    val w = Window.orderBy(col("c").desc, col("term"))
    // the rank-≤-maxV cut rides as an EXPLICIT orderBy+limit so it plans
    // as TakeOrderedAndProject (each map task keeps an O(maxV) heap):
    // maxV = 4096 exceeds windowGroupLimitThreshold (1000), so the
    // filter-above-window form would NOT rewrite and the full vocabulary
    // would cross the single-partition exchange (ADVICE r9). The total
    // order (c desc, term) is deterministic, so limit-then-rank ≡
    // rank-then-filter exactly; the window then ranks ≤ maxV rows.
    counts.orderBy(col("c").desc, col("term")).limit(OovVocabSizes.max.toInt)
      .withColumn("rank", row_number().over(w))
      .select(explode(array(OovVocabSizes.map(lit): _*)).as("vocab_size"),
        col("rank"), col("c"))
      .filter(col("rank") <= col("vocab_size"))
      .groupBy(col("vocab_size"))
      .agg(count(lit(1)).as("n_vocab_terms"),
        sum(col("c")).as("invocab_tokens"))
      .crossJoin(broadcast(totals))
      .selectExpr("vocab_size", "n_vocab_terms", "invocab_tokens",
        "total_tokens - invocab_tokens AS oov_tokens",
        "((total_tokens - invocab_tokens) * 1000000) div total_tokens" +
          " AS oov_ppm")
      .orderBy(col("vocab_size"))
  }

  /** g39's heuristic-keep threshold: splits every test SF near 50/50
    * (measured medians 0.4317/0.4300/0.4286), so all four agreement
    * cells stay populated. */
  val KappaQualityTau = 0.43

  /** g39: inter-signal agreement (Cohen's κ, Cohen '60) between the two
    * cheap quality raters the engine ships — t18's hashed classifier
    * (score ≥ 0.5) and t02's heuristic gate (quality ≥
    * [[KappaQualityTau]]): the audit a data board runs before swapping
    * one filter for the other, since raw percent-agreement rewards two
    * raters that both just say "keep". κ = (N·(a+d) − pe) / (N² − pe)
    * with pe = (a+b)(a+c) + (c+d)(b+d) — emitted as the EXACT BIGINT
    * numerator/denominator pair (a07's rational-output discipline) plus
    * the rounded micro-value; the only FP is the one final division,
    * on identical integers in both engines.
    *
    * Scale: both raters are one-scan token aggregates over the same
    * documents table; the contingency table is a 4-cell aggregate. */
  def g39Kappa(s: SparkSession, d: String): DataFrame = {
    val clf = hashedClfScored(s, d)
      .select(col("doc_id"), (col("score") >= 0.5).as("ka"))
    val heur = t02Quality(s, d)
      .select(col("doc_id"), (col("quality") >= KappaQualityTau).as("kb"))
    val cells = clf.join(heur, "doc_id")
      .agg(
        sum(when(col("ka") && col("kb"), 1L).otherwise(0L)).as("a"),
        sum(when(col("ka") && !col("kb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("ka") && col("kb"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("ka") && !col("kb"), 1L).otherwise(0L)).as("d"))
    cells
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .withColumn("pe_num",
        (col("a") + col("b")) * (col("a") + col("c")) +
          (col("c") + col("d")) * (col("b") + col("d")))
      .withColumn("kappa_num", col("n") * (col("a") + col("d")) - col("pe_num"))
      .withColumn("kappa_den", col("n") * col("n") - col("pe_num"))
      .select(col("a"), col("b"), col("c"), col("d"), col("n"),
        col("kappa_num"), col("kappa_den"),
        // degenerate contingency table (either rater constant → pe = n²)
        // has κ undefined; emit NULL on BOTH sides rather than let Spark's
        // null-on-div-0 diverge from DuckDB's round(inf) cast error
        when(col("kappa_den") === 0L, lit(null).cast("long"))
          .otherwise(
            round(col("kappa_num").cast("double") / col("kappa_den").cast("double")
              * 1000000).cast("long")).as("kappa_micros"))
  }

  val queries: Map[String, Q] = Map(
    "g39_kappa"        -> g39Kappa _,
    "t24_feature_hash" -> t24FeatureHash _,
    "t25_vocab_growth" -> t25VocabGrowth _,
    "t26_bpe_pairs"   -> t26BpePairs _,
    "t27_oov_ladder"  -> t27OovLadder _,
    "t01_token_count" -> t01TokenCount _,
    "t02_quality"     -> t02Quality _,
    "t03_langid"      -> t03LangId _,
    "t04_fingerprint" -> t04Fingerprint _,
    "t05_subword_tokens" -> t05SubwordTokens _,
    "t28_tokenizer_fertility" -> t28TokenizerFertility _,
    "t06_keywords"    -> t06Keywords _,
    "t07_sentiment"   -> t07Sentiment _,
    "t08_token_pack"  -> t08TokenPack _,
    "t09_redact"      -> t09Redact _,
    "t10_repetition"  -> t10Repetition _,
    "t11_ngram_topk"  -> t11NgramTopK _,
    "t12_normalize"   -> t12Normalize _,
    "t13_chunk"       -> t13Chunk _,
    "t14_boilerplate" -> t14Boilerplate _,
    "t15_unigram_lm"  -> t15UnigramLm _,
    "t16_dsir_weights" -> t16DsirWeights _,
    "t17_gopher_rules" -> t17GopherRules _,
    "t18_classifier"   -> t18Classifier _,
    "g38_calibration"  -> g38Calibration _,
    "t19_char_entropy" -> t19CharEntropy _,
    "t20_readability" -> t20Readability _,
    "t21_bigram_lm"   -> t21BigramLm _,
    "t22_pii_scan"    -> t22PiiScan _,
    "t23_trained_classifier" -> t23TrainedClassifier _,
    "g14_heavy_hitters" -> g14HeavyHitters _,
    "g16_quality_psi" -> g16QualityPsi _,
  )

  /** Shared SQL fragments for the DuckDB oracle (public: the dedup
    * oracles MUST tokenize bit-identically to [[normText]]/[[tokens]],
    * so they reference these instead of re-inlining the regex). DuckDB's
    * regexp_replace needs the 'g' flag to match Spark's replace-all
    * default. */
  val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  val ToksSql = s"string_split($NormSql, ' ')"

  /** The t18 hashed-classifier scored frame as DuckDB CTEs (`f`/`w`/`s`)
    * — shared by the t18 and g38 oracles so the scoring formula cannot
    * drift between the rows that consume it. */
  private val HashedClfCteSql = s"""
      f AS (
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5(term), 1, 3) AS INT) AS INT) AS b
        FROM (SELECT doc_id, unnest($ToksSql) AS term FROM documents)
        WHERE term <> ''),
      w AS (
        SELECT CAST(range AS INT) AS b,
               CAST(CAST('0x' || substr(md5('clf' || range), 1, 3) AS INT)
                 AS DOUBLE) / $ClfWeightScale - 1.0 AS w
        FROM range($DsirBuckets)),
      s AS (
        SELECT f.doc_id, count(*) AS n_tokens,
               round(1.0 / (1.0 + exp(-(sum(w.w) / count(*)))), 6) AS score
        FROM f JOIN w USING (b) GROUP BY f.doc_id)"""

  /** The t04 content fingerprint — shared by the t04/d06/p16 oracles. */
  val FpSql = s"md5($NormSql)"

  /** [[graft.dedup.Dedup.shingles]] in DuckDB form over a bound tokens
    * column — shared by the d02/d03/d07/d08/d09/t14/p16 oracles so the
    * shingle construction can never drift between them. */
  def shinglesSql(toksCol: String): String =
    s"list_distinct(list_transform(range(1, len($toksCol) - 1), " +
      s"i -> $toksCol[i] || ' ' || $toksCol[i+1] || ' ' || $toksCol[i+2]))"

  /** The t02 quality composite over bound `toks`/`norm` columns — shared
    * by the t02/d09/p16 oracles. The d09/p16 oracles compare these
    * doubles for equality/ordering against the Spark side, so all three
    * MUST evaluate the same expression tree (same ops, same order) for
    * the round(·,6) results to agree bitwise. */
  val QualityExprSql: String =
    """round(least(1.0, CAST(len(toks) AS DOUBLE) / 200.0) * 0.4
           + (CAST(len(list_filter(toks, w ->
                list_contains(['the','a','of','to','in','and','is'], w)))
              AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.3
           + (CASE WHEN length(norm) = 0 THEN 0.0
                   ELSE CAST(length(regexp_replace(norm, '[^a-z ]', '', 'g'))
                        AS DOUBLE) / CAST(length(norm) AS DOUBLE) END) * 0.3,
           6)"""

  val oracleSql: Map[String, String] = Map(
    // t24: same tokenizer, same md5-prefix bucket, exact rollup
    // t25: same first-occurrence rule — a term is in a rung iff its min
    // doc_id falls in the prefix; docs with zero non-empty tokens count
    // in no rung
    // t27: same counts frame, same (count desc, term) ranking; the rung
    // join against the FULL ranked table ≡ the Spark side's rank<=maxV
    // prune (rungs never exceed maxV); sums CAST against HUGEINT
    "t27_oov_ladder" -> s"""
      WITH tok AS (SELECT unnest($ToksSql) AS term FROM documents),
      cnt AS (
        SELECT term, CAST(count(*) AS BIGINT) AS c
        FROM tok WHERE term <> '' GROUP BY 1),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens FROM cnt),
      rk AS (
        SELECT term, c, row_number() OVER (ORDER BY c DESC, term) AS rank
        FROM cnt),
      lad AS (
        SELECT CAST(unnest([${OovVocabSizes.mkString(", ")}]) AS BIGINT)
          AS vocab_size),
      agg AS (
        SELECT l.vocab_size, CAST(count(*) AS BIGINT) AS n_vocab_terms,
               CAST(sum(r.c) AS BIGINT) AS invocab_tokens
        FROM rk r JOIN lad l ON r.rank <= l.vocab_size GROUP BY 1)
      SELECT vocab_size, n_vocab_terms, invocab_tokens,
             total_tokens - invocab_tokens AS oov_tokens,
             ((total_tokens - invocab_tokens) * 1000000) // total_tokens
               AS oov_ppm
      FROM agg, tot ORDER BY vocab_size""",
    // t26: the same vocabulary frame, adjacent char pairs via substr over
    // 1..len-1 (DuckDB range is half-open so single-char words drop,
    // matching the Spark length>=2 guard); sums CAST against HUGEINT
    "t26_bpe_pairs" -> s"""
      WITH w AS (SELECT unnest($ToksSql) AS word FROM documents),
      v AS (
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM w WHERE word <> '' GROUP BY 1),
      pos AS (
        SELECT word, n, unnest(range(1, length(word))) AS i FROM v),
      p AS (
        SELECT substr(word, CAST(i AS INT), 2) AS pair,
               CAST(sum(n) AS BIGINT) AS n_pairs
        FROM pos GROUP BY 1),
      r AS (
        SELECT row_number() OVER (ORDER BY n_pairs DESC, pair) AS rank,
               pair, n_pairs
        FROM p)
      SELECT rank, pair, n_pairs FROM r
      WHERE rank <= $BpeTopPairs ORDER BY rank""",
    "t25_vocab_growth" -> s"""
      WITH rungs AS (
        SELECT CAST(unnest([${VocabRungDenoms.mkString(", ")}]) AS BIGINT)
                 AS denom,
               (SELECT max(doc_id) FROM documents) AS mx),
      cuts AS (SELECT denom, (mx + 1) // denom AS cut FROM rungs),
      tok AS (
        SELECT doc_id, unnest($ToksSql) AS term FROM documents),
      toks AS (SELECT doc_id, term FROM tok WHERE term <> ''),
      firsts AS (SELECT term, min(doc_id) AS fd FROM toks GROUP BY 1),
      vocab AS (
        SELECT c.cut, count(*) AS vocab
        FROM firsts f JOIN cuts c ON f.fd < c.cut GROUP BY 1),
      dtok AS (SELECT doc_id, count(*) AS nt FROM toks GROUP BY 1),
      dstats AS (
        SELECT c.cut, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
        FROM dtok d JOIN cuts c ON d.doc_id < c.cut GROUP BY 1)
      SELECT d.cut, d.n_docs, d.n_tokens, v.vocab,
             v.vocab - coalesce(lag(v.vocab) OVER (ORDER BY d.cut), 0)
               AS new_terms,
             (v.vocab * 1000000) // d.n_tokens AS ttr_ppm
      FROM dstats d JOIN vocab v ON v.cut = d.cut
      ORDER BY d.cut""",
    "t24_feature_hash" -> s"""
      WITH tok AS (
        SELECT doc_id, unnest($ToksSql) AS term FROM documents),
      b AS (
        SELECT doc_id, term,
               CAST('0x' || substr(md5(term), 1, 4) AS INT)
                 % $FeatureHashBuckets AS bucket
        FROM tok WHERE term <> '')
      SELECT bucket, count(*) AS tf,
             count(DISTINCT doc_id) AS df,
             count(DISTINCT term) AS n_terms
      FROM b GROUP BY 1 ORDER BY bucket""",
    // t23: split sizes + label counts exact (md5 gate + the same margin
    // arithmetic, doubles computed identically: *10.0/len then ln); the
    // held-out accuracy of the actually-trained model is the TRUE band
    "t23_trained_classifier" -> s"""
      WITH f AS (
        SELECT doc_id,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10.0
                 / length(text)
               + ln(1 + length(text)) AS margin
        FROM documents WHERE length(text) > 0)
      SELECT CASE WHEN ${graft.functions.HashGate.sql("doc_id", TrainedClfTestGateHex)}
                  THEN 'test' ELSE 'train' END AS split,
             count(*) AS n_docs,
             CAST(count(*) FILTER (WHERE margin > $TrainedClfThreshold)
                  AS BIGINT) AS n_pos,
             TRUE AS acc_ok
      FROM f GROUP BY 1 ORDER BY split""",
    // DuckDB range(a, b, s) is end-exclusive; list slicing l[a:b] is
    // 1-based inclusive and clamps at the array end, matching Spark's
    // slice(arr, start, len). chunk_idx counts from 0 in both (posexplode
    // / range position).
    "t13_chunk" -> s"""
      WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
      st AS (
        SELECT doc_id, len(toks) AS n_tokens, toks,
               unnest(range(1, greatest(len(toks), 1) + 1, $ChunkStride)) AS start
        FROM t),
      c AS (
        SELECT doc_id, n_tokens,
               CAST((start - 1) / $ChunkStride AS BIGINT) AS chunk_idx,
               toks[start : start + ${ChunkSize - 1}] AS chunk
        FROM st)
      SELECT doc_id, n_tokens, chunk_idx,
             len(chunk) AS n_chunk_tokens,
             md5(array_to_string(chunk, ' ')) AS chunk_fp
      FROM c ORDER BY doc_id, chunk_idx""",
    // chr(769) = U+0301 combining acute; chr(233) = precomposed U+00E9. DuckDB's
    // nfc_normalize must agree with the native NfcNormalize expression
    // that the decomposed branch composes (length −1) and the
    // precomposed branch is a fixed point, converging on one final char.
    "t12_normalize" -> s"""
      WITH a AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 2 = 0 THEN 'cafe' || chr(769)
                            ELSE 'caf' || chr(233) END AS aug
        FROM documents),
      n AS (SELECT doc_id, aug, nfc_normalize(aug) AS norm FROM a)
      SELECT doc_id,
             length(aug) AS n_raw,
             length(norm) AS n_nfc,
             length(norm) < length(aug) AS changed,
             right(norm, 1) AS last_char
      FROM n ORDER BY doc_id""",
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
                         / CAST(length(norm) AS DOUBLE) END AS alpha,
               $QualityExprSql AS quality
        FROM t)
      SELECT doc_id,
             CAST(n_tok AS BIGINT) AS n_tokens,
             round(sum_len / n_tok, 6) AS avg_token_len,
             round(n_stop / n_tok, 6) AS stop_ratio,
             round(alpha, 6) AS alpha_ratio,
             quality
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
      SELECT doc_id, $FpSql AS fp, length($NormSql) AS norm_len
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
    // t28: same normalizer/tokenizer fragments as t01/t05 (shared NormSql/
    // ToksSql so the regexes cannot drift); sums CAST back to BIGINT
    // (DuckDB sum() promotes to HUGEINT — the r08 lesson); the byte-
    // economy division NULL-guarded identically on both sides
    "t28_tokenizer_fertility" -> s"""
      WITH t AS (
        SELECT lang,
               len($ToksSql) AS nw,
               len(regexp_extract_all($NormSql, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS nsub,
               strlen($NormSql) AS nb
        FROM documents)
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nw) AS BIGINT) AS n_ws_tokens,
             CAST(sum(nsub) AS BIGINT) AS n_subwords,
             CAST(sum(nb) AS BIGINT) AS n_bytes,
             CAST(sum(nsub) * 1000000 // sum(nw) AS BIGINT) AS fertility_ppm,
             CASE WHEN sum(nsub) = 0 THEN NULL
                  ELSE CAST(sum(nb) * 1000000 // sum(nsub) AS BIGINT)
             END AS bytes_per_subword_ppm
      FROM t GROUP BY lang ORDER BY lang""",
    "t06_keywords" -> s"""
      WITH terms AS (
        SELECT doc_id, unnest($ToksSql) AS term FROM documents),
      tf AS (
        SELECT doc_id, term, count(*) AS tf FROM terms
        WHERE NOT list_contains(['the','a','of','to','in','and','is'], term)
          AND term <> ''
        GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term) AS rank
        FROM scored)
      SELECT doc_id, rank, term, round(tfidf, 6) AS tfidf
      FROM ranked WHERE rank <= 3
      ORDER BY doc_id, rank""",
    "t08_token_pack" -> s"""
      WITH t AS (
        SELECT doc_id, source, len($ToksSql) AS n_tokens FROM documents),
      c AS (
        SELECT doc_id, source, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        FROM t)
      SELECT source, CAST(floor(prior / 512.0) AS BIGINT) AS bin,
             count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      FROM c GROUP BY source, bin ORDER BY source, bin""",
    "t09_redact" -> s"""
      WITH t AS (SELECT doc_id, $NormSql AS norm FROM documents),
      r AS (SELECT doc_id, norm,
                   regexp_replace(norm, '[0-9]+', '<num>', 'g') AS red
            FROM t)
      SELECT doc_id,
             len(regexp_extract_all(norm, '[0-9]+')) AS n_nums,
             md5(red) AS redacted_fp,
             length(red) AS redacted_len
      FROM r ORDER BY doc_id""",
    "t11_ngram_topk" -> s"""
      WITH t AS (SELECT lang, $ToksSql AS t FROM documents),
      b AS (
        SELECT lang, unnest(list_transform(range(1, len(t)),
                 i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM t),
      c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY lang, bigram),
      r AS (
        SELECT lang, bigram, n,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n DESC, bigram) AS rank
        FROM c)
      SELECT lang, rank, bigram, n FROM r
      WHERE rank <= $NgramTopK
      ORDER BY lang, rank""",
    "t10_repetition" -> s"""
      WITH t AS (SELECT doc_id, $ToksSql AS t FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(greatest(len(t) - 1, 0) AS BIGINT) AS tot2,
               CAST(len(list_distinct(list_transform(range(1, len(t)),
                 i -> t[i] || ' ' || t[i+1]))) AS BIGINT) AS d2,
               CAST(greatest(len(t) - 2, 0) AS BIGINT) AS tot3,
               CAST(len(list_distinct(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS BIGINT) AS d3
        FROM t),
      md AS (
        SELECT doc_id, max(c) AS top_cnt FROM (
          SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest(t) AS tok FROM t)
          GROUP BY doc_id, tok)
        GROUP BY doc_id),
      f AS (
        SELECT m.doc_id, m.n_tokens,
               CASE WHEN tot2 = 0 THEN 0.0
                    ELSE round((tot2 - d2) * 1.0 / tot2, 6) END AS dup_2gram_frac,
               CASE WHEN tot3 = 0 THEN 0.0
                    ELSE round((tot3 - d3) * 1.0 / tot3, 6) END AS dup_3gram_frac,
               CASE WHEN m.n_tokens = 0 THEN 0.0
                    ELSE round(coalesce(top_cnt, 0) * 1.0 / m.n_tokens, 6) END AS top_tok_frac
        FROM m LEFT JOIN md ON m.doc_id = md.doc_id)
      SELECT doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac, top_tok_frac,
             (dup_3gram_frac > 0.15 OR top_tok_frac > 0.3) AS is_repetitive
      FROM f ORDER BY doc_id""",
    "t07_sentiment" -> s"""
      WITH t AS (
        SELECT doc_id, $ToksSql AS toks FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(list_filter(toks, w ->
                 list_contains(['fast','small','merge'], w))) AS BIGINT) AS n_pos,
               CAST(len(list_filter(toks, w ->
                 list_contains(['slow','big','dup'], w))) AS BIGINT) AS n_neg,
               CAST(len(toks) AS DOUBLE) AS n_tok
        FROM t),
      p AS (
        SELECT doc_id, n_pos, n_neg,
               CASE WHEN n_tok = 0 THEN 0.0
                    ELSE CAST(n_pos - n_neg AS DOUBLE) / n_tok END AS polarity
        FROM m)
      SELECT doc_id, n_pos, n_neg, round(polarity, 6) AS polarity,
             CASE WHEN polarity > 0.01 THEN 'positive'
                  WHEN polarity < -0.01 THEN 'negative'
                  ELSE 'neutral' END AS label
      FROM p ORDER BY doc_id""",
    // same 3-gram construction as the d02/d08 oracles; freq = the
    // corpus-frequent shingle set the Spark side broadcasts
    "t14_boilerplate" -> s"""
      WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
      sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
      freq AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= $BoilerFloorSql),
      sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
      hits AS (
        SELECT sh.doc_id, count(*) AS n_frequent
        FROM sh JOIN freq USING (s) GROUP BY sh.doc_id)
      SELECT s.doc_id, s.n_shingles, coalesce(h.n_frequent, 0) AS n_frequent,
             round(coalesce(h.n_frequent, 0) * 1.0 / s.n_shingles, 6) AS boiler_frac
      FROM sizes s LEFT JOIN hits h USING (doc_id)
      ORDER BY doc_id""",
    "t15_unigram_lm" -> s"""
      WITH tok AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
      tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
      cnt AS (SELECT term, count(*) AS c FROM tok2 GROUP BY term),
      tot AS (SELECT sum(c) AS total FROM cnt),
      lm AS (SELECT term, ln(c * 1.0 / total) AS logp FROM cnt, tot)
      SELECT doc_id, count(*) AS n_tokens,
             round(avg(logp), 6) AS avg_logp,
             round(min(logp), 6) AS min_logp
      FROM tok2 JOIN lm USING (term)
      GROUP BY doc_id ORDER BY doc_id""",
    // same 3-hex md5 bucket arithmetic as HashGate.sqlShard; ln = Spark's
    // natural log; smoothing adds 1 per bucket / DsirBuckets per total
    "t16_dsir_weights" -> s"""
      WITH tok AS (SELECT doc_id, lang, unnest($ToksSql) AS term FROM documents),
      f AS (
        SELECT doc_id, lang,
               CAST(CAST('0x' || substr(md5(term), 1, 3) AS INT) AS INT) AS b
        FROM tok WHERE term <> ''),
      c AS (
        SELECT b, count(*) AS raw_c,
               sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS tgt_c
        FROM f GROUP BY b),
      t AS (SELECT sum(raw_c) AS raw_total, sum(tgt_c) AS tgt_total FROM c),
      r AS (
        SELECT b, ln((tgt_c + 1) * 1.0 / (tgt_total + $DsirBuckets))
                - ln((raw_c + 1) * 1.0 / (raw_total + $DsirBuckets)) AS lr
        FROM c, t),
      w AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(sum(lr), 6) AS logw
        FROM f JOIN r USING (b) GROUP BY doc_id),
      m AS (SELECT round(avg(logw), 6) AS mean_logw FROM w)
      SELECT doc_id, n_tokens, logw, logw > mean_logw AS selected
      FROM w, m ORDER BY doc_id""",
    // t17: every ratio divides exact integer counts (drift-free across
    // engines); the rule booleans compare the same round(·,6) doubles.
    // Spark's split(text, '\n') and DuckDB's string_split(text, chr(10))
    // both yield one-element lists on the newline-free corpus.
    "t17_gopher_rules" -> s"""
      WITH t AS (
        SELECT doc_id, $ToksSql AS toks,
               string_split(text, chr(10)) AS lines
        FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               round(list_sum(list_transform(toks, w -> len(w))) * 1.0
                     / len(toks), 6) AS mean_word_len,
               round(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
                     * 1.0 / len(toks), 6) AS alpha_frac,
               round(len(list_filter(toks, w -> contains(w, '#')
                       OR contains(w, '...') OR contains(w, '…')))
                     * 1.0 / len(toks), 6) AS symbol_ratio,
               round(len(list_filter(lines, l -> starts_with(trim(l), '-')
                       OR starts_with(trim(l), '*')
                       OR starts_with(trim(l), '•')))
                     * 1.0 / len(lines), 6) AS bullet_frac,
               round(len(list_filter(lines, l -> ends_with(trim(l), '...')
                       OR ends_with(trim(l), '…')))
                     * 1.0 / len(lines), 6) AS ellipsis_frac,
               CAST(len(list_distinct(list_filter(toks, w ->
                     list_contains(['the','a','of','to','in','and','is'], w))))
                    AS BIGINT) AS n_stopwords
        FROM t)
      SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
             bullet_frac, ellipsis_frac, n_stopwords,
             n_words BETWEEN $GopherMinWords AND $GopherMaxWords AS r_words,
             mean_word_len BETWEEN 3.0 AND 10.0 AS r_mean_len,
             alpha_frac >= 0.8 AS r_alpha,
             symbol_ratio <= 0.1 AS r_symbol,
             bullet_frac <= 0.9 AS r_bullet,
             ellipsis_frac <= 0.3 AS r_ellipsis,
             n_stopwords >= $GopherMinStopwords AS r_stop,
             (n_words BETWEEN $GopherMinWords AND $GopherMaxWords)
               AND mean_word_len BETWEEN 3.0 AND 10.0
               AND alpha_frac >= 0.8 AND symbol_ratio <= 0.1
               AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
               AND n_stopwords >= $GopherMinStopwords AS keep
      FROM m ORDER BY doc_id""",
    // same 3-hex md5 bucket arithmetic as t16, same md5('clf'||b) weight
    // stub, same sigmoid; keep thresholds the rounded score in both
    // engines so the 0.5 cut cannot flip on float noise
    "t18_classifier" -> s"""
      WITH $HashedClfCteSql
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score,
             score >= 0.5 AS keep
      FROM s ORDER BY doc_id""",
    // g39: both rater CTEs restated (classifier CTE shared verbatim,
    // heuristic quality via the shared QualityExprSql), κ as exact
    // integer numerator/denominator with one final rounded division
    "g39_kappa" -> s"""
      WITH $HashedClfCteSql,
      qh AS (
        SELECT doc_id, $QualityExprSql AS quality
        FROM (SELECT doc_id, $ToksSql AS toks, $NormSql AS norm
              FROM documents)),
      cells AS (
        SELECT
          CAST(sum(CASE WHEN s.score >= 0.5 AND qh.quality >= $KappaQualityTau
            THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(sum(CASE WHEN s.score >= 0.5 AND qh.quality < $KappaQualityTau
            THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(sum(CASE WHEN s.score < 0.5 AND qh.quality >= $KappaQualityTau
            THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(sum(CASE WHEN s.score < 0.5 AND qh.quality < $KappaQualityTau
            THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM s JOIN qh USING (doc_id)),
      k AS (
        SELECT a, b, c, d, a + b + c + d AS n,
               (a + b) * (a + c) + (c + d) * (b + d) AS pe_num
        FROM cells)
      SELECT a, b, c, d, n,
             CAST(n * (a + d) - pe_num AS BIGINT) AS kappa_num,
             CAST(n * n - pe_num AS BIGINT) AS kappa_den,
             CASE WHEN n * n - pe_num = 0 THEN NULL
                  ELSE CAST(round(CAST(n * (a + d) - pe_num AS DOUBLE)
                    / CAST(n * n - pe_num AS DOUBLE) * 1000000) AS BIGINT)
             END AS kappa_micros
      FROM k""",
    // g38: the identical scored CTE; bins on the 6-dp-rounded score,
    // all gaps in exact integer micro-units (no division anywhere)
    "g38_calibration" -> s"""
      WITH $HashedClfCteSql,
      sc AS (
        SELECT least(CAST(floor(s.score * 10) AS BIGINT), 9) AS bin,
               CAST(round(s.score * 1000000) AS BIGINT) AS score_micros,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM s JOIN documents d USING (doc_id)),
      bins AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(score_micros) AS BIGINT) AS sum_score_micros
        FROM sc GROUP BY bin),
      g AS (
        SELECT bin, n, n_pos, sum_score_micros,
               abs(sum_score_micros - n_pos * 1000000) AS gap_micros
        FROM bins)
      SELECT bin, n, n_pos, sum_score_micros,
             CAST(gap_micros AS BIGINT) AS gap_micros FROM g
      UNION ALL
      SELECT -1, CAST(sum(n) AS BIGINT), CAST(sum(n_pos) AS BIGINT),
             CAST(sum(sum_score_micros) AS BIGINT),
             CAST(sum(gap_micros) AS BIGINT)
      FROM g
      ORDER BY bin""",
    // t19: the same H = ln n − Σ c·ln c / n identity over per-doc char
    // counts; string_split(s, '') splits to characters in both engines
    "t19_char_entropy" -> s"""
      WITH ch AS (
        SELECT doc_id, unnest(string_split($NormSql, '')) AS ch
        FROM documents),
      c AS (
        SELECT doc_id, ch, count(*) AS c
        FROM ch WHERE ch <> '' GROUP BY doc_id, ch),
      e AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_chars,
               count(*) AS n_distinct_chars,
               round(ln(CAST(sum(c) AS DOUBLE)) -
                 sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 6) AS char_entropy
        FROM c GROUP BY doc_id)
      SELECT doc_id, n_chars, n_distinct_chars, char_entropy,
             char_entropy < $MinCharEntropy AS low_entropy
      FROM e ORDER BY doc_id""",
    // t20: the identical literal formula over the same integer counts;
    // vowel GROUPS per token via regexp_extract_all, min 1
    "t20_readability" -> s"""
      WITH t AS (
        SELECT doc_id, lang,
               CAST(len($ToksSql) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform($ToksSql,
                 w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))))
                 AS BIGINT) AS n_sylls,
               CAST(greatest(1, len(regexp_extract_all(text, '[.!?]')))
                 AS BIGINT) AS n_sents
        FROM documents)
      SELECT doc_id, lang, n_words, n_sylls, n_sents,
             round(206.835 - 1.015 * (n_words * 1.0 / n_sents)
                   - 84.6 * (n_sylls * 1.0 / n_words), 4) AS flesch
      FROM t ORDER BY doc_id""",
    // t21: the same add-one bigram MLE re-derived — identical count
    // tables, identical (cbg+1)/(cu+V) arithmetic, ln + round(6)
    "t21_bigram_lm" -> s"""
      WITH t AS (
        SELECT doc_id, list_filter($ToksSql, w -> w <> '') AS tk
        FROM documents),
      bgidx AS (
        SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
        FROM t WHERE len(tk) >= 2),
      bg AS (
        SELECT doc_id, tk[i] AS w1, tk[i] || ' ' || tk[i + 1] AS bg
        FROM bgidx),
      tok AS (SELECT unnest(tk) AS term FROM t),
      uni AS (SELECT term, count(*) AS cu FROM tok GROUP BY term),
      voc AS (SELECT count(*) AS v FROM uni),
      bgc AS (SELECT w1, bg, count(*) AS cbg FROM bg GROUP BY w1, bg),
      lm AS (
        SELECT bg, ln((cbg + 1) * 1.0 / (cu + v)) AS logp
        FROM bgc JOIN uni ON bgc.w1 = uni.term, voc)
      SELECT doc_id, count(*) AS n_bigrams,
             round(avg(logp), 6) AS avg_logp,
             round(min(logp), 6) AS min_logp
      FROM bg JOIN lm USING (bg)
      GROUP BY doc_id ORDER BY doc_id""",
    // t22: the derived release view, the three detectors, and the
    // email→phone→ip mask composition restated verbatim; masked CONTENT
    // is pinned by the order-free md5-prefix integer sum
    "t22_pii_scan" -> s"""
      WITH rel AS (
        SELECT event_type,
               'uid=' || user_id || ' mail=u' || user_id || '@ex' ||
               (user_id % 7) || '.example phone=+1-555-' ||
               lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') ||
               ' ip=10.' || (user_id % 256) || '.' || (event_id % 256) ||
               '.7 props=' || props AS line
        FROM events),
      m AS (
        SELECT event_type,
               len(regexp_extract_all(line, '$PiiEmailRe')) AS ne,
               len(regexp_extract_all(line, '$PiiPhoneRe')) AS np,
               len(regexp_extract_all(line, '$PiiIpRe')) AS ni,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(line, '$PiiEmailRe', '<email>', 'g'),
                   '$PiiPhoneRe', '<phone>', 'g'),
                 '$PiiIpRe', '<ip>', 'g') AS masked
        FROM rel)
      SELECT event_type,
             count(*) AS n_events,
             CAST(sum(ne) AS BIGINT) AS n_emails,
             CAST(sum(np) AS BIGINT) AS n_phones,
             CAST(sum(ni) AS BIGINT) AS n_ips,
             count(DISTINCT masked) AS n_masked_distinct,
             CAST(sum(('0x' || substr(md5(masked), 1, 8))::BIGINT) AS BIGINT)
               AS mask_sum,
             CAST(sum(length(masked)) AS BIGINT) AS masked_len
      FROM m
      GROUP BY event_type
      ORDER BY event_type""",
    // g16: the same t02 scores, bin ladder, dense grid, smoothing, and
    // PSI algebra — identical expression shape so the 6-dp rounds agree
    "g16_quality_psi" -> s"""
      WITH t AS (
        SELECT doc_id, source, $ToksSql AS toks, $NormSql AS norm
        FROM documents),
      q AS (SELECT source, $QualityExprSql AS quality FROM t),
      b AS (SELECT source,
                   CAST(least(floor(quality * $PsiBins), ${PsiBins - 1}) AS INT)
                     AS bin FROM q),
      counts AS (SELECT source, bin, count(*) AS n FROM b GROUP BY source, bin),
      grid AS (
        SELECT s.source, g.bin
        FROM (SELECT DISTINCT source FROM counts) s,
             (SELECT unnest(range(0, $PsiBins)) AS bin) g),
      dense AS (
        SELECT grid.source, grid.bin, coalesce(counts.n, 0) AS n
        FROM grid LEFT JOIN counts USING (source, bin)),
      st AS (SELECT source, sum(n) AS n_src FROM dense GROUP BY source),
      cb AS (SELECT bin, sum(n) AS n_bin FROM dense GROUP BY bin),
      ct AS (SELECT sum(n) AS n_all FROM dense),
      contrib AS (
        SELECT dense.source, st.n_src,
               ((dense.n + 0.5) / (st.n_src + ${0.5 * PsiBins})
                 - (cb.n_bin + 0.5) / (ct.n_all + ${0.5 * PsiBins}))
               * ln(((dense.n + 0.5) / (st.n_src + ${0.5 * PsiBins}))
                    / ((cb.n_bin + 0.5) / (ct.n_all + ${0.5 * PsiBins}))) AS c
        FROM dense JOIN st USING (source) JOIN cb USING (bin), ct)
      SELECT source, CAST(n_src AS BIGINT) AS n_docs,
             round(sum(c), 6) AS psi,
             round(sum(c), 6) > $PsiDriftMax AS drifted
      FROM contrib
      GROUP BY source, n_src
      ORDER BY source""",
    // g14: the exact top-k ranking is oracle-computable from the same
    // token stream; the sketch's two guarantees ride as booleans the
    // engine must deliver TRUE
    "g14_heavy_hitters" -> s"""
      WITH tok AS (
        SELECT unnest(list_filter($ToksSql, w -> w <> '')) AS term
        FROM documents),
      c AS (SELECT term, count(*) AS true_n FROM tok GROUP BY term)
      SELECT term, true_n, TRUE AS overcount_ok, TRUE AS bound_ok
      FROM c ORDER BY true_n DESC, term LIMIT $HeavyK""",
  )
}
