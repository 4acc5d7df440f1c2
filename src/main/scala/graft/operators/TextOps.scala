package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.round

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` table: token counting, quality scoring, stopword-based
  * language ID, and document fingerprinting. All computed with native
  * Catalyst expressions (split/transform/filter/md5) — no UDFs, so the
  * whole pass stays inside whole-stage codegen and is embarrassingly
  * parallel (pure map, no shuffle except the final presentation sort).
  */
object TextOps {

  private val Stopwords =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for", "on", "with")

  /** Whitespace tokens of the trimmed text. */
  private def tokensCol: Column = split(trim(col("text")), "\\s+")

  /** HTML boilerplate extraction — the first step of every web-corpus
    * pipeline (what trafilatura/jusText do before any quality or dedup
    * stage runs). The corpus is plain token soup, so each document is
    * wrapped in a deterministic HTML page FIXTURE (title, script block,
    * nav/footer boilerplate, entities — all parameterized by doc_id,
    * the media-header pattern), and the operator must get the article
    * text back out: drop script blocks and nav/footer chrome, strip
    * the remaining tags, decode the common entities, and collapse
    * whitespace. The DuckDB oracle performs the IDENTICAL wrap and
    * extraction, so any regex/ordering bug hash-mismatches; `body_md5`
    * pins the full extracted text. Patterns stay in the Java-regex ∩
    * RE2 subset (no lookaround/backrefs), and the whole pass is native
    * column expressions — one codegen'd map over the corpus, no
    * shuffle except the presentation sort.
    */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      lit("<html><head><title>Doc "), col("doc_id"),
      lit("</title><script>var trk="), col("doc_id") % 7,
      lit(";</script></head><body><nav>home | about | archive</nav><h1>Doc "),
      col("doc_id"), lit("</h1><p>"), col("text"),
      lit("</p><footer>&copy; 2024 Example &amp; Co &lt;legal&gt;</footer></body></html>"))
    val noScript = regexp_replace(raw, "<script[^>]*>[^<]*</script>", " ")
    val noChrome = regexp_replace(
      regexp_replace(noScript, "<nav>[^<]*</nav>", " "),
      "<footer>[^<]*</footer>", " ")
    val noTags = regexp_replace(noChrome, "<[^>]*>", " ")
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
                      "&quot;" -> "\"", "&copy;" -> "(c)")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    val body = trim(regexp_replace(decoded, "\\s+", " "))
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_extract(raw, "<title>([^<]*)</title>", 1).as("title"),
        length(raw).cast("long").as("n_raw_chars"),
        length(body).cast("long").as("n_text_chars"),
        round(length(body).cast("double") / length(raw).cast("double"), 6)
          .as("text_ratio"),
        md5(body).as("body_md5"))
      .orderBy(col("doc_id"))
  }

  /** GPT-2-style pre-tokenizer pieces (letter runs / digit runs /
    * punctuation runs, each with optional leading space) — the "BPE-ish
    * regex" count; a real BPE merges within these pieces, so this is the
    * upper bound a byte-pair tokenizer starts from.
    */
  private val BpePieceRegex = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Token statistics per document: whitespace tokens, BPE-ish regex
    * pieces, and the chars/4 subword estimate commonly published for
    * byte-pair-encoded corpora.
    */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .withColumn("tokens", tokensCol)
      .select(
        col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        size(regexp_extract_all(lower(col("text")), lit(BpePieceRegex), lit(0)))
          .cast("long").as("n_bpe_pieces"),
        length(col("text")).cast("long").as("n_chars_text"),
        (floor(length(col("text")) / 4)).cast("long").as("n_subwords_est"),
        round(
          aggregate(transform(col("tokens"), t => length(t).cast("double")),
                    lit(0.0), (acc, x) => acc + x) /
            greatest(size(col("tokens")), lit(1)),
          6).as("avg_token_len")
      )
      .orderBy(col("doc_id"))

  /** Quality scoring: stopword ratio, unique-token ratio, mean token
    * length — the length/stopword-ratio heuristics used by published
    * web-corpus filters (C4/Gopher-style rules).
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    Tables
      .documents(spark, dir)
      .withColumn("tokens", tokensCol)
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
      .withColumn(
        "n_stopwords",
        size(filter(col("tokens"), t => array_contains(stopArr, t))).cast("long"))
      .withColumn("n_unique", size(array_distinct(col("tokens"))).cast("long"))
      .withColumn("stopword_ratio",
                  round(col("n_stopwords").cast("double") / col("n_tokens"), 6))
      .withColumn("unique_ratio",
                  round(col("n_unique").cast("double") / col("n_tokens"), 6))
      .withColumn(
        "quality_score",
        round(
          when(col("n_tokens") >= 10, lit(0.5)).otherwise(lit(0.0))
            + when(col("stopword_ratio").between(0.05, 0.6), lit(0.25))
              .otherwise(lit(0.0))
            + col("unique_ratio") * 0.25,
          6))
      .select(col("doc_id"), col("n_tokens"), col("n_stopwords"), col("n_unique"),
              col("stopword_ratio"), col("unique_ratio"), col("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility per source slice: corpus-level chars-per-piece
    * and pieces-per-word for the BPE-ish pre-tokenizer vs whitespace
    * words — the standard report for how a tokenizer "spends" its
    * budget on each corpus source (fertility ↑ means more pieces per
    * word, i.e. the tokenizer fits that slice poorly). Ratios are
    * derived from exact integer sums, so they are independent of
    * partition summation order at any scale. One pure-map pass + a
    * source-cardinality aggregation (partial agg absorbs everything
    * map-side).
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .withColumn("nt", size(tokensCol).cast("long"))
      .withColumn(
        "nb",
        size(regexp_extract_all(lower(col("text")), lit(BpePieceRegex), lit(0)))
          .cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           sum(col("nt")).as("sum_ws_tokens"),
           sum(col("nb")).as("sum_bpe_pieces"))
      .select(
        col("source"), col("n_docs"), col("sum_chars"), col("sum_ws_tokens"),
        col("sum_bpe_pieces"),
        round(col("sum_chars").cast("double") / col("sum_bpe_pieces"), 6)
          .as("chars_per_piece"),
        round(col("sum_bpe_pieces").cast("double") / col("sum_ws_tokens"), 6)
          .as("pieces_per_word"))
      .orderBy(col("source"))

  /** Gopher-style quality rule panel (the appendix-A heuristics of
    * Rae et al. 2021, re-expressed on the whitespace tokenizer): each
    * rule is its own boolean column so a pipeline run can audit WHY a
    * document was dropped — the additive form web-corpus filters
    * (Gopher/FineWeb/Dolma) actually publish, where [[textQuality]]
    * collapses everything into one score. Rules: word count in
    * [50, 100000]; mean word length in [3, 10]; ≥ 2 stopwords;
    * ≥ 80% of tokens contain a letter; duplicate-bigram fraction
    * ≤ 0.2 (the repetition family of [[textRepetition]]). `keep` is
    * the conjunction.
    *
    * Scale shape: pure per-row map over one scan — no shuffle, fully
    * codegen'd; at 100 TB this is the cheapest stage of the filter
    * chain and fuses with whatever scan feeds it.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    Tables
      .documents(spark, dir)
      .withColumn("tokens", tokensCol)
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
      .withColumn("sum_len",
                  aggregate(col("tokens"), lit(0L), (a, t) => a + length(t)))
      .withColumn("mean_word_len",
                  round(col("sum_len").cast("double") / col("n_tokens"), 6))
      .withColumn(
        "n_stopwords",
        size(filter(col("tokens"), t => array_contains(stopArr, t))).cast("long"))
      .withColumn("n_alpha",
                  size(filter(col("tokens"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("alpha_ratio",
                  round(col("n_alpha").cast("double") / col("n_tokens"), 6))
      .withColumn(
        "bg",
        when(size(col("tokens")) >= 2,
             transform(sequence(lit(1), size(col("tokens")) - 1),
                       i =>
                         concat_ws(" ", element_at(col("tokens"), i),
                                   element_at(col("tokens"), i + 1))))
          .otherwise(array().cast("array<string>")))
      .withColumn("n_bigrams", size(col("bg")).cast("long"))
      .withColumn("n_dup_bigrams",
                  (size(col("bg")) - size(array_distinct(col("bg")))).cast("long"))
      .withColumn(
        "dup_bigram_ratio",
        round(col("n_dup_bigrams").cast("double") /
                greatest(col("n_bigrams"), lit(1L)),
              6))
      // rule predicates in exact integer form (5·x ≥ 4·n ⇔ x/n ≥ 0.8):
      // no float literal ever sits on a decision boundary, so Spark and
      // the DuckDB oracle can never disagree on a tie
      .withColumn("r_word_count", col("n_tokens").between(50L, 100000L))
      .withColumn("r_mean_word_len",
                  col("sum_len") >= lit(3L) * col("n_tokens") &&
                    col("sum_len") <= lit(10L) * col("n_tokens"))
      .withColumn("r_stopwords", col("n_stopwords") >= 2L)
      .withColumn("r_alpha", lit(5L) * col("n_alpha") >= lit(4L) * col("n_tokens"))
      .withColumn("r_repetition",
                  lit(5L) * col("n_dup_bigrams") <= col("n_bigrams"))
      .withColumn("keep",
                  col("r_word_count") && col("r_mean_word_len") &&
                    col("r_stopwords") && col("r_alpha") && col("r_repetition"))
      .select(col("doc_id"), col("n_tokens"), col("mean_word_len"),
              col("n_stopwords"), col("alpha_ratio"), col("dup_bigram_ratio"),
              col("r_word_count"), col("r_mean_word_len"), col("r_stopwords"),
              col("r_alpha"), col("r_repetition"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID heuristic: English marker-token ratio (n-gram/stopword
    * scoring). Predicts 'en' when markers exceed 5% of tokens, else
    * 'other' — deterministic, so oracle-checkable; accuracy vs the `lang`
    * label is a separate judged metric, not correctness.
    */
  def textLangId(spark: SparkSession, dir: String): DataFrame = {
    val markers = array(Stopwords.map(lit): _*)
    Tables
      .documents(spark, dir)
      .withColumn("tokens", tokensCol)
      .withColumn(
        "en_ratio",
        round(size(filter(col("tokens"), t => array_contains(markers, t)))
                .cast("double") /
                greatest(size(col("tokens")), lit(1)),
              6))
      .withColumn("pred_lang",
                  when(col("en_ratio") > 0.05, "en").otherwise("other"))
      .select(col("doc_id"), col("lang").as("label_lang"), col("en_ratio"),
              col("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprints: (a) exact content hash of the
    * whitespace-normalized lowercased text; (b) order-insensitive
    * bag-of-words hash (sorted distinct tokens) — the cheap first stage of
    * a dedup cascade.
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .select(
        col("doc_id"),
        md5(col("norm")).as("content_hash"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("norm"), " ")))))
          .as("bag_hash")
      )
      .orderBy(col("doc_id"))

  /** Rolling-hash winnowing fingerprints (k=8 char-grams, window w=4) —
    * see [[graft.functions.WinnowFingerprintExpr]]; any shared substring
    * of ≥ 11 chars between two documents yields a shared fingerprint.
    */
  def textWinnow(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      // with_size barrier: ONE winnowing pass per document — explode +
      // size as separate references each re-ran the rolling hash
      // (PlanSpec guards the reference count)
      .select(col("doc_id"),
              explode(graft.functions.TextExprs.withSize(
                graft.functions.TextExprs.winnowFingerprints(col("text"), 8, 4)))
                .as("p"))
      .select(col("doc_id"), col("p.x").as("fp"),
              col("p.n").as("n_fingerprints"))
      .orderBy(col("doc_id"), col("fp"))

  /** Confusion matrix of the stopword language detector against the
    * labelled language — the evaluation loop for any heuristic filter: a
    * pipeline promotes a classifier only with this table in hand. Reuses
    * [[textLangId]] verbatim; one tiny two-key aggregation plus a
    * per-label share computed against a broadcast label total.
    */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val preds = textLangId(spark, dir)
    val labelTotals = broadcast(
      preds.groupBy(col("label_lang")).agg(count(lit(1)).as("n_label")))
    preds
      .groupBy(col("label_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .join(labelTotals, "label_lang")
      .select(col("label_lang"), col("pred_lang"), col("n_docs"),
              round(col("n_docs").cast("double") /
                      col("n_label").cast("double"),
                    6).as("label_share"))
      .orderBy(col("label_lang"), col("pred_lang"))
  }

  /** Word-bigram repetition signals (the Gopher/MassiveText "repetition"
    * family, Rae et al. '21 §A1.1): fraction of duplicated 2-grams per
    * document — high duplication flags boilerplate/spam for the quality
    * cascade. Pure per-row array expressions: no shuffle, no state, scans
    * prune to (doc_id, text).
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    val bigrams = when(
      size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
                i =>
                  concat_ws(" ", element_at(toks, i),
                            element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    Tables
      .documents(spark, dir)
      .withColumn("bg", bigrams)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(col("bg")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bg"))).cast("long").as("n_distinct_bigrams"))
      .withColumn(
        "dup_ratio",
        round((col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
                greatest(col("n_bigrams"), lit(1L)),
              6))
      .orderBy(col("doc_id"))
  }

  // ---- DuckDB oracles ----------------------------------------------------

  private[operators] val stopList = Stopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Quality-score oracle CTE chain (qt→qs→qr→qq; `qq` carries every
    * output column) — ONE definition of the scoring formula, shared by
    * the `text_quality` oracle and `cluster_representatives` so the two
    * can never drift. Names are prefixed `q` to compose into WITH
    * chains that already define other CTEs.
    */
  private[operators] val qualityCteSql: String =
    s"""qt AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens FROM documents),
       |qs AS (
       |  SELECT doc_id,
       |         CAST(len(tokens) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(tokens, t -> t IN $stopList)) AS BIGINT) AS n_stopwords,
       |         CAST(len(list_distinct(tokens)) AS BIGINT) AS n_unique
       |  FROM qt
       |),
       |qr AS (
       |  SELECT *, round(CAST(n_stopwords AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
       |            round(CAST(n_unique AS DOUBLE) / n_tokens, 6) AS unique_ratio
       |  FROM qs
       |),
       |qq AS (
       |  SELECT doc_id, n_tokens, n_stopwords, n_unique, stopword_ratio, unique_ratio,
       |         round((CASE WHEN n_tokens >= 10 THEN 0.5 ELSE 0.0 END)
       |               + (CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 0.25 ELSE 0.0 END)
       |               + unique_ratio * 0.25, 6) AS quality_score
       |  FROM qr
       |)""".stripMargin

  /** k-gram power-sum form of the rolling hash for the oracle:
    * hash(i) = Σ_j ascii(m[i+j]) · 257^(k−1−j) mod 1e9+7 — term products
    * stay < 1.3e11 and the 8-term sum < 2^63, so int64 SQL arithmetic is
    * exact.
    */
  private[operators] val winnowHashSql: String = {
    val M = 1000000007L
    val pows = (0 until 8).map { j =>
      var p = 1L
      (0 until (7 - j)).foreach(_ => p = p * 257L % M)
      p
    }
    pows.zipWithIndex
      .map { case (p, j) => s"CAST(ascii(substr(m, p.i + $j, 1)) AS BIGINT) * $p" }
      .mkString("(", " + ", s") % $M")
  }

  private lazy val langidSql: String =
    s"""WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS tokens FROM documents),
       |s AS (
       |  SELECT doc_id, lang AS label_lang,
       |         round(CAST(len(list_filter(tokens, t -> t IN $stopList)) AS DOUBLE)
       |               / greatest(len(tokens), 1), 6) AS en_ratio
       |  FROM t
       |)
       |SELECT doc_id, label_lang, en_ratio,
       |       CASE WHEN en_ratio > 0.05 THEN 'en' ELSE 'other' END AS pred_lang
       |FROM s ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // the identical wrap + extraction chain (same regex subset, same
    // replace order, 'g' for Spark's replace-all default)
    "html_extract" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |         '</title><script>var trk=' || CAST(doc_id % 7 AS VARCHAR) ||
        |         ';</script></head><body><nav>home | about | archive</nav><h1>Doc ' ||
        |         CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
        |         '</p><footer>&copy; 2024 Example &amp; Co &lt;legal&gt;</footer></body></html>'
        |           AS raw
        |  FROM documents
        |),
        |x AS (
        |  SELECT doc_id, raw,
        |         trim(regexp_replace(
        |           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |           regexp_replace(
        |             regexp_replace(
        |               regexp_replace(
        |                 regexp_replace(raw, '<script[^>]*>[^<]*</script>', ' ', 'g'),
        |                 '<nav>[^<]*</nav>', ' ', 'g'),
        |               '<footer>[^<]*</footer>', ' ', 'g'),
        |             '<[^>]*>', ' ', 'g'),
        |           '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
        |           '&quot;', '"', 'g'), '&copy;', '(c)', 'g')) AS body0
        |  FROM w
        |),
        |y AS (SELECT doc_id, raw,
        |             trim(regexp_replace(body0, '\s+', ' ', 'g')) AS body
        |      FROM x)
        |SELECT doc_id,
        |       regexp_extract(raw, '<title>([^<]*)</title>', 1) AS title,
        |       CAST(length(raw) AS BIGINT) AS n_raw_chars,
        |       CAST(length(body) AS BIGINT) AS n_text_chars,
        |       round(CAST(length(body) AS DOUBLE)
        |             / CAST(length(raw) AS DOUBLE), 6) AS text_ratio,
        |       md5(body) AS body_md5
        |FROM y ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents
        |),
        |b AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]) AS bg
        |  FROM d
        |)
        |SELECT doc_id, n_tokens,
        |       CAST(len(bg) AS BIGINT) AS n_bigrams,
        |       CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams,
        |       round(CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
        |             / greatest(len(bg), 1), 6) AS dup_ratio
        |FROM b ORDER BY doc_id""".stripMargin,
    "tokenizer_fertility" ->
      """WITH t AS (
        |  SELECT source, n_chars,
        |         len(string_split_regex(trim(text), '\s+')) AS nt,
        |         len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS nb
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(nt) AS BIGINT) AS sum_ws_tokens,
        |       CAST(sum(nb) AS BIGINT) AS sum_bpe_pieces,
        |       round(CAST(sum(n_chars) AS DOUBLE) / sum(nb), 6) AS chars_per_piece,
        |       round(CAST(sum(nb) AS DOUBLE) / sum(nt), 6) AS pieces_per_word
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    // rule predicates in exact integer form — mirrors the Spark side, so
    // no float literal sits on a decision boundary in either engine
    "gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens FROM documents),
         |s AS (
         |  SELECT doc_id,
         |         CAST(len(tokens) AS BIGINT) AS n_tokens,
         |         CAST(list_sum(list_transform(tokens, x -> length(x))) AS BIGINT) AS sum_len,
         |         CAST(len(list_filter(tokens, x -> x IN $stopList)) AS BIGINT) AS n_stopwords,
         |         CAST(len(list_filter(tokens, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         |         list_transform(range(1, len(tokens)), i -> tokens[i] || ' ' || tokens[i + 1]) AS bg
         |  FROM t
         |),
         |r AS (
         |  SELECT doc_id, n_tokens, sum_len, n_stopwords, n_alpha,
         |         CAST(len(bg) AS BIGINT) AS n_bigrams,
         |         CAST(len(bg) - len(list_distinct(bg)) AS BIGINT) AS n_dup_bigrams
         |  FROM s
         |)
         |SELECT doc_id, n_tokens,
         |       round(CAST(sum_len AS DOUBLE) / n_tokens, 6) AS mean_word_len,
         |       n_stopwords,
         |       round(CAST(n_alpha AS DOUBLE) / n_tokens, 6) AS alpha_ratio,
         |       round(CAST(n_dup_bigrams AS DOUBLE) / greatest(n_bigrams, 1), 6) AS dup_bigram_ratio,
         |       n_tokens BETWEEN 50 AND 100000 AS r_word_count,
         |       (sum_len >= 3 * n_tokens AND sum_len <= 10 * n_tokens) AS r_mean_word_len,
         |       n_stopwords >= 2 AS r_stopwords,
         |       5 * n_alpha >= 4 * n_tokens AS r_alpha,
         |       5 * n_dup_bigrams <= n_bigrams AS r_repetition,
         |       ((n_tokens BETWEEN 50 AND 100000) AND sum_len >= 3 * n_tokens
         |         AND sum_len <= 10 * n_tokens AND n_stopwords >= 2
         |         AND 5 * n_alpha >= 4 * n_tokens
         |         AND 5 * n_dup_bigrams <= n_bigrams) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "text_winnow" ->
      s"""WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS m FROM documents),
         |h AS (
         |  SELECT doc_id, p.i AS pos, length(m) - 7 AS nh,
         |         $winnowHashSql AS hv
         |  FROM n, UNNEST(range(1, length(m) - 6)) p(i)
         |),
         |wmin AS (
         |  SELECT doc_id, pos, nh,
         |         min(hv) OVER (PARTITION BY doc_id ORDER BY pos
         |                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
         |  FROM h
         |),
         |sel AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE pos <= nh - 3)
         |SELECT doc_id, fp,
         |       CAST(count(*) OVER (PARTITION BY doc_id) AS INT) AS n_fingerprints
         |FROM sel ORDER BY doc_id, fp""".stripMargin,
    "text_tokens" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS tokens FROM documents)
        |SELECT doc_id,
        |       len(tokens) AS n_tokens,
        |       len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS n_bpe_pieces,
        |       length(text) AS n_chars_text,
        |       CAST(floor(length(text) / 4) AS BIGINT) AS n_subwords_est,
        |       round(list_reduce(list_transform(tokens, t -> CAST(length(t) AS DOUBLE)), (a, b) -> a + b)
        |             / greatest(len(tokens), 1), 6) AS avg_token_len
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH $qualityCteSql
         |SELECT doc_id, n_tokens, n_stopwords, n_unique, stopword_ratio, unique_ratio,
         |       quality_score
         |FROM qq ORDER BY doc_id""".stripMargin,
    "text_langid" -> langidSql,
    "langid_confusion" ->
      s"""WITH p AS (SELECT * FROM ($langidSql) z),
         |t AS (SELECT label_lang, count(*) AS n_label FROM p GROUP BY 1)
         |SELECT p.label_lang, pred_lang, count(*) AS n_docs,
         |       round(CAST(count(*) AS DOUBLE) / CAST(n_label AS DOUBLE), 6) AS label_share
         |FROM p JOIN t ON p.label_lang = t.label_lang
         |GROUP BY p.label_lang, pred_lang, n_label
         |ORDER BY p.label_lang, pred_lang""".stripMargin,
    "text_fingerprint" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents)
        |SELECT doc_id,
        |       md5(norm) AS content_hash,
        |       md5(array_to_string(list_sort(list_distinct(string_split(norm, ' '))), ' ')) AS bag_hash
        |FROM n ORDER BY doc_id""".stripMargin
  )
}
