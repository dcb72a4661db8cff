package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalyzer

/** Text-analysis operators for training-data pipelines: language ID
  * (marker-word heuristic), quality scoring (length/punctuation/stopword
  * ratios), token counting (whitespace + analyzer + subword estimate) and
  * document fingerprinting (sorted-distinct-token key collision hash).
  *
  * Everything is pure Column algebra (codegen-friendly, one pass over the
  * text, no shuffle except explicit aggregations), and every formula is
  * replayable in ANSI SQL for the oracles.
  */
object TextAnalysis {

  /** Marker words per language for the n-gram/marker language heuristic.
    * Deliberately tiny and deterministic; precedence below breaks ties.
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "les", "une", "et", "est"))

  /** Every token-derived count in ONE compiled pass: per-language marker
    * hits (Markers order), stopword hits, distinct-token count. The
    * interpreted `filter(toks, isin(...))` HOF costs ~8× a per-row loop
    * (the measured trap the 13-gram census hit), and language + quality
    * over one corpus reference token counts ~7 times per row — so the
    * fused admission scans (pipeline_curation) paid it 7-fold. The UDF is
    * deterministic; codegen's subexpression elimination shares one
    * evaluation across the fields a projection reads. Null tokens → null
    * struct, so every downstream null branch is unchanged.
    */
  private val markerSets: Array[Set[String]] = Markers.map(_._2.toSet).toArray
  // the UDF's tuple return hardcodes this arity (marker counts at _1.._4,
  // stops at _5, uniq at _6) — a grown Markers list must fail HERE, not
  // silently read the stopword field as the 5th language's count
  require(markerSets.length == 4,
    s"tokStatsUdf's return tuple assumes exactly 4 Markers languages; got ${markerSets.length}")
  private val stopSet: Set[String] = TextAnalyzer.StopWords.toSet
  private val tokStatsUdf = udf { (toks: Seq[String]) =>
    if (toks == null) None
    else {
      val mc = new Array[Int](markerSets.length)
      var stops = 0
      val seen = new java.util.HashSet[String]()
      val it = toks.iterator
      while (it.hasNext) {
        val t = it.next()
        var i = 0
        while (i < mc.length) { if (markerSets(i).contains(t)) mc(i) += 1; i += 1 }
        if (stopSet.contains(t)) stops += 1
        seen.add(t)
      }
      Some((mc(0), mc(1), mc(2), mc(3), stops, seen.size))
    }
  }
  private def tokStats(toks: Column): Column = tokStatsUdf(toks)
  private def markerCount(st: Column, i: Int): Column = st.getField(s"_${i + 1}")
  private def stopHits(st: Column): Column = st.getField("_5")
  private def uniqCount(st: Column): Column = st.getField("_6")

  /** The predicted-language EXPRESSION over a tokens column — shared by
    * [[languageId]] and fused single-scan consumers (pipeline_curation
    * computes language + quality in one projection over one corpus scan
    * instead of two scans joined back). Ties resolve by the fixed
    * precedence en > de > es > fr (the Markers order); null/empty token
    * arrays classify as 'und'.
    */
  def predLangExpr(toks: Column): Column = {
    val st = tokStats(toks)
    val counts = Markers.indices.map(markerCount(st, _))
    val maxc = greatest(counts: _*)
    val pred = Markers.zip(counts).foldLeft(when(lit(false), lit("")): Column) {
      case (acc, ((lang, _), c)) => acc.when(c === maxc, lit(lang))
    }
    when(maxc === 0, lit("und")).otherwise(pred)
  }

  /** Predicted language + per-language marker hits. */
  def languageId(df: DataFrame, id: Column, text: Column): DataFrame = {
    // null text classifies as 'und' (counts 0), not a null row — keeps the
    // engine and the SQL oracle on the same branch
    val toks = coalesce(Dedup.tokens(text), array().cast("array<string>"))
    val st = tokStats(toks)
    df.select(
      id.as("id") +: predLangExpr(toks).as("pred_lang") +:
        Markers.zipWithIndex.map { case ((l, _), i) =>
          markerCount(st, i).as(s"c_$l")
        }: _*)
  }

  // the four quality components, factored so quality() (which outputs each
  // of them) and qualityExpr() (the fused single-scan composite) stay one
  // formula — a drift between the two would silently split the oracle
  private def stopwordRatioExpr(toks: Column, nTokens: Column): Column =
    stopHits(tokStats(toks)).cast("double") / nTokens
  /** Whitespace spelled as an EXPLICIT char class (same set as Java `\s`),
    * never `\s` itself: Java's includes U+000B where RE2's (DuckDB) does
    * not — the same cross-engine rule [[BpeLikePattern]] documents. The
    * oracles use the identical class, so a vertical tab cannot flip a
    * punct_ratio or a ws_tokens count between engines.
    */
  val WsClass = " \\t\\n\\x0B\\f\\r"

  private def punctRatioExpr(text: Column, nChars: Column): Column =
    (length(text) - length(regexp_replace(text, s"[^\\p{L}\\p{N}$WsClass]", "")))
      .cast("double") / nChars
  private def uniqRatioExpr(toks: Column, nTokens: Column): Column =
    uniqCount(tokStats(toks)).cast("double") / nTokens
  private def lenScoreExpr(nTokens: Column): Column =
    least(nTokens.cast("double") / 100.0, lit(1.0))
  private def compositeExpr(
      lenScore: Column, stop: Column, punct: Column, uniq: Column): Column =
    lit(0.25) * lenScore + lit(0.25) * (lit(1.0) - stop) +
      lit(0.25) * (lit(1.0) - punct) + lit(0.25) * uniq

  /** Quality metrics + a composite score:
    * score = 0.25·len_score + 0.25·(1−stopword_ratio) + 0.25·(1−punct_ratio)
    *         + 0.25·uniq_ratio,  len_score = min(n_tokens/100, 1).
    */
  def quality(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = Dedup.tokens(text)
    val base = df.select(
      id.as("id"),
      length(text).cast("long").as("n_chars"),
      toks.as("_toks"),
      text.as("_text"))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .filter(col("n_tokens") > 0)
    base
      .withColumn("stopword_ratio", stopwordRatioExpr(col("_toks"), col("n_tokens")))
      .withColumn("punct_ratio", punctRatioExpr(col("_text"), col("n_chars")))
      .withColumn("uniq_ratio", uniqRatioExpr(col("_toks"), col("n_tokens")))
      .withColumn("len_score", lenScoreExpr(col("n_tokens")))
      .withColumn("quality",
        compositeExpr(col("len_score"), col("stopword_ratio"),
          col("punct_ratio"), col("uniq_ratio")))
      .select("id", "n_chars", "n_tokens", "stopword_ratio", "punct_ratio",
        "uniq_ratio", "quality")
  }

  /** Encoding-quality signals — the mojibake gate every web-scale
    * pipeline runs before anything tokenizes: replacement characters
    * (U+FFFD, what a lossy transcode leaves behind), C0/C1 control
    * characters (NUL-ridden binary mistaken for text), and their
    * per-character ratios; `encoding_ok` applies the standard admission
    * rule (no replacement chars, < 0.1% control chars). Pure per-row
    * regex algebra — each count is `length(text) − length(text with the
    * class removed)`, the formulation any engine replays exactly.
    */
  def encodingQuality(df: DataFrame, id: Column, text: Column,
      maxControlRatio: Double = 0.001): DataFrame = {
    require(maxControlRatio >= 0.0 && maxControlRatio < 1.0,
      s"maxControlRatio must be in [0,1) (got $maxControlRatio)")
    def classCount(c: Column, pattern: String): Column =
      (length(c) - length(regexp_replace(c, pattern, ""))).cast("long")
    df.filter(text.isNotNull)
      .select(
        id.as("id"),
        length(text).cast("long").as("n_chars"),
        classCount(text, "�").as("n_replacement"),
        // C0 minus \t\n\r (legitimate whitespace), plus DEL and C1
        classCount(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]")
          .as("n_control"))
      .withColumn("control_ratio",
        when(col("n_chars") === 0L, lit(0.0))
          .otherwise(col("n_control").cast("double") / col("n_chars").cast("double")))
      .withColumn("encoding_ok",
        col("n_replacement") === 0L && col("control_ratio") < lit(maxControlRatio))
  }

  /** The composite-quality EXPRESSION over (text, tokens) — [[quality]]'s
    * formula as a single Column for fused single-scan consumers. NULL when
    * the text has no tokens (quality() drops those rows; a fused admission
    * filter's `>= threshold` rejects the null the same way).
    */
  def qualityExpr(text: Column, toks: Column): Column = {
    val nTokens = size(toks).cast("long")
    when(nTokens > 0,
      compositeExpr(
        lenScoreExpr(nTokens),
        stopwordRatioExpr(toks, nTokens),
        punctRatioExpr(text, length(text).cast("long")),
        uniqRatioExpr(toks, nTokens)))
  }

  /** BPE-style pre-tokenizer pattern: letter runs, digit runs, and
    * non-alphanumeric runs each count as one pre-token (the unit a BPE
    * vocabulary then splits further). ASCII classes only, deliberately —
    * Java regex and RE2 (DuckDB) agree on them, so the count is
    * oracle-replayable. Whitespace is spelled as an EXPLICIT char class,
    * not `\\s`: Java's `\\s` includes U+000B (vertical tab) while RE2's
    * does not, so `\\s` would silently diverge on control characters.
    */
  val BpeLikePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]+"

  def tokenCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("id"),
      // null text counts NULL, not -1: Spark's legacy size(null) = -1
      // where the oracle's len(NULL) is NULL — the guard keeps a null-text
      // row from splitting the hash compare
      when(text.isNotNull,
        size(filter(split(text, s"[$WsClass]+"), t => t =!= "")))
        .cast("long").as("ws_tokens"),
      when(text.isNotNull, size(TextAnalyzer.analyze(text)))
        .cast("long").as("analyzed_tokens"),
      regexp_count(text, lit(BpeLikePattern)).cast("long").as("bpe_like_tokens"),
      ceil(length(text).cast("double") / 4.0).cast("long").as("est_subword_tokens"))

  /** Key-collision fingerprint: md5 of the space-joined sorted distinct
    * lowercase tokens — whitespace/word-order/duplication-invariant.
    */
  def fingerprint(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("id"),
      // concat_ws SKIPS a null array (→ md5("")), where the oracle's
      // md5(NULL) is NULL — null text fingerprints as NULL in both engines
      when(text.isNotNull,
        md5(concat_ws(" ", array_sort(array_distinct(Dedup.tokens(text))))))
        .as("fingerprint"))

  /** EXACT n-gram benchmark decontamination (the GPT-3 appendix-C / PaLM
    * convention, Brown et al. 2020): a training document is contaminated
    * when it shares any exact token `n`-gram (n = 13 canonically) with
    * the held-out evaluation set. Complements [[winnow]]-based
    * decontamination: winnowing is a probabilistic sketch with density
    * 2/(w+1); this is the EXHAUSTIVE exact-match census the published
    * pipelines actually ran.
    *
    * Returns one row per TRAIN document (`isEval` false) that has at
    * least one n-gram: (id, n_grams distinct, eval_hits distinct,
    * contaminated_frac = hits/n_grams). Callers drop/trim documents above
    * a hit threshold.
    *
    * Scale (100 TB): grams travel as BINARY md5 (16 bytes — half the hex
    * string's 32, an eighth of a raw 13-token gram; 128 bits keeps
    * accidental collisions off the table at trillion-gram scale where a
    * 64-bit hash would birthday-collide), the eval side is
    * benchmark-sized so its distinct gram set BROADCASTS, and the train
    * side stays one narrow explode + broadcast-hash-join + per-doc
    * bounded aggregation — no corpus-sized shuffle beyond the (id, gram)
    * distinct, which is capped by document length. Every decision is a
    * pure row property: DuckDB replays the exact contaminated set (the
    * oracle joins the raw gram strings — the hash never changes the
    * SET, only the wire representation).
    */
  def ngramContamination(
      df: DataFrame, id: Column, text: Column, isEval: Column,
      n: Int = 13): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    val toks = graft.operators.Dedup.tokens(text)
    // the per-doc gram pass is a compiled UDF, NOT
    // transform(sequence(...), i => md5(concat_ws(slice(...)))) — the
    // interpreted higher-order function walks an expression tree (and
    // re-copies a 13-token slice) PER GRAM, measured ~8× slower than
    // this tight loop with one reused MessageDigest (the winnow-sketch
    // lesson, same file above). Dedupe happens INSIDE the array
    // (array_distinct semantics): exploded rows are already distinct per
    // doc, so the aggregation is plain counts — not the 2× expand a
    // multi-countDistinct would plan. 16-byte arrays are value-injective
    // under BigInteger equality, so the seen-set is an exact dedupe.
    val gramUdf = udf { (ts: Seq[String]) =>
      if (ts == null || ts.length < n) Array.empty[Array[Byte]]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val m = ts.length - n + 1
        val seen = new java.util.HashSet[java.math.BigInteger]()
        val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        var i = 0
        while (i < m) {
          val sb = new StringBuilder(ts(i))
          var t = 1
          while (t < n) { sb.append(' ').append(ts(i + t)); t += 1 }
          md.reset()
          val h = md.digest(sb.toString.getBytes("UTF-8"))
          if (seen.add(new java.math.BigInteger(h))) out += h
          i += 1
        }
        out.toArray
      }
    }
    val grams = df
      .filter(text.isNotNull)
      .select(id.as("id"), isEval.as("_eval"),
        explode(gramUdf(toks)).as("g"))
    val evalGrams = grams.filter(col("_eval")).select("g").distinct()
    grams.filter(!col("_eval"))
      .join(broadcast(evalGrams.withColumn("_hit", lit(true))), Seq("g"), "left")
      .groupBy("id")
      .agg(
        count(col("g")).as("n_grams"),
        count(when(col("_hit"), col("g"))).as("eval_hits"))
      .withColumn("contaminated_frac",
        col("eval_hits").cast("double") / col("n_grams"))
  }

  /** Winnowing sketch (Schleimer, Wilkerson, Aiken — "Winnowing: Local
    * Algorithms for Document Fingerprinting", SIGMOD'03): hash every token
    * `n`-gram (md5-based 60-bit, the repo's cross-engine hash), slide a
    * window of `w` consecutive hashes, keep the RIGHTMOST minimum of each
    * window. The guarantee: any shared run of `w + n − 1` tokens between
    * two documents yields at least one shared (pos-independent) sketch
    * hash — the local rolling-hash fingerprint for plagiarism/near-dup
    * detection, with expected density 2/(w+1) of the grams. Documents shorter than a window
    * contribute their single rightmost-min gram. Output is exploded
    * `(id, pos, hash)` rows (pos = 1-based gram position): narrow,
    * shuffle-free, and the natural join key for sketch-overlap scoring.
    */
  def winnow(df: DataFrame, id: Column, text: Column,
      n: Int = 3, window: Int = 4): DataFrame = {
    require(n > 0 && window > 0, s"n and window must be positive (got $n, $window)")
    val sketchUdf = udf { (toks: Seq[String]) =>
      if (toks == null || toks.length < n) Array.empty[(Int, Long)]
      else {
        val m = toks.length - n + 1
        val md = java.security.MessageDigest.getInstance("MD5")
        val hs = new Array[Long](m)
        var i = 0
        while (i < m) {
          val sb = new StringBuilder(toks(i))
          var t = 1
          while (t < n) { sb.append(' ').append(toks(i + t)); t += 1 }
          hs(i) = Dedup.hash60Local(md, sb.toString)
          i += 1
        }
        val picked = scala.collection.mutable.LinkedHashSet[Int]()
        if (m <= window) {
          // sub-window document: single rightmost global min
          var best = 0
          var j = 1
          while (j < m) { if (hs(j) <= hs(best)) best = j; j += 1 }
          picked += best
        } else {
          var start = 0
          while (start + window <= m) {
            var best = start
            var j = start + 1
            while (j < start + window) { if (hs(j) <= hs(best)) best = j; j += 1 }
            picked += best
            start += 1
          }
        }
        picked.toArray.map(p => (p + 1, hs(p))) // 1-based, matching SQL lists
      }
    }
    df.select(id.as("id"), Dedup.tokens(text).as("_toks"))
      .select(col("id"), explode(sketchUdf(col("_toks"))).as("_s"))
      .select(col("id"), col("_s._1").as("pos"), col("_s._2").as("hash"))
  }

  /** Near-dup candidate pairs from winnowing sketches: equi-join on the
    * sketch hash, keep pairs sharing ≥ `minShared` distinct hashes. The
    * scale story is the sketch size: the join input carries an expected
    * 2/(window+1) of the gram postings a shingle join would shuffle — with
    * the same guarantee
    * (every shared `window+n−1`-token run surfaces). Same skew hazard as
    * stop-shingles — a boilerplate run shared by a large corpus fraction
    * fans out; cap with a df filter upstream if the corpus has one.
    */
  def winnowPairs(sketch: DataFrame, minShared: Long): DataFrame = {
    require(minShared > 0, s"minShared must be positive (got $minShared)")
    val d = sketch.select(col("id"), col("hash")).distinct()
    val a = d.select(col("id").as("id_a"), col("hash"))
    val b = d.select(col("id").as("id_b"), col("hash"))
    a.join(b, Seq("hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** DIRECTED containment (Broder's containment coefficient, "On the
    * resemblance and containment of documents", 1997, over the winnowing
    * sketch): c(a→b) = |S_a ∩ S_b| / |S_a| — how much of document a
    * lives inside document b. The ASYMMETRIC complement of the jaccard
    * near-dup pair: an excerpt, quote, or copy-with-additions scores
    * near 1.0 in one direction while jaccard stays low, which is exactly
    * the case symmetric dedup misses in curation (keep the superset
    * document, drop the excerpt). Emits BOTH directions of every
    * intersecting pair (c is not symmetric), filtered at `minShared`
    * shared sketch hashes and `minContainment`.
    *
    * Scale (100 TB): the same (hash) equi-join shape as [[winnowPairs]]
    * — sketches are density 2/(w+1) of the gram stream, pair volume is
    * bounded by shared sketch hashes (never all-pairs), sketch sizes are
    * one id-keyed count, and the final normalization is an id_a-keyed
    * equi-join. Every number is exact integer arithmetic + one double
    * division — fully oracle-replayable.
    */
  def winnowContainment(sketch: DataFrame, minShared: Long,
      minContainment: Double): DataFrame = {
    require(minShared > 0, s"minShared must be positive (got $minShared)")
    require(minContainment >= 0.0 && minContainment <= 1.0,
      s"minContainment must be in [0,1] (got $minContainment)")
    val d = sketch.select(col("id"), col("hash")).distinct()
    val sizes = d.groupBy(col("id")).agg(count(lit(1)).as("_sz"))
    val a = d.select(col("id").as("id_a"), col("hash"))
    val b = d.select(col("id").as("id_b"), col("hash"))
    a.join(b, Seq("hash"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(sizes.withColumnRenamed("id", "id_a"), "id_a")
      .withColumn("containment", col("shared").cast("double") / col("_sz"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("shared"), col("containment"))
  }

  /** Repetition quality filters (the Gopher/MassiveText family): how much
    * of a document is the document repeating itself. Per doc:
    *
    *   - `n_lines`, `dup_line_frac`: non-blank lines, and the fraction of
    *     them that are repeats of another line (1 − distinct/total);
    *   - `dup_2gram_frac` / `dup_3gram_frac`: fraction of word-n-gram
    *     occurrences that are repeats (1 − distinct/total);
    *   - `top_2gram_frac`: fraction of 2-gram occurrences taken by the
    *     single most frequent 2-gram (boilerplate detector).
    *
    * Documents too short to have grams score 0.0 (not-repetitive — the
    * Gopher convention), so a downstream `frac <= threshold` admission
    * keeps them. Null text is dropped (no content to measure).
    *
    * Scale: line stats are per-row array algebra (no shuffle). Gram stats
    * explode to (id, gram) and aggregate — both shuffle keys include the
    * id, so a stop-gram cannot concentrate (the per-key row count is
    * bounded by ONE document's grams), partial aggregation combines
    * map-side, and the join back to the line frame is id-keyed. The
    * per-element HOF gram build is interpreted, so gram cost is O(n·L)
    * per doc on the materialized token array — linear, not the O(L²)
    * re-tokenize trap.
    */
  def repetition(df: DataFrame, id: Column, text: Column): DataFrame = {
    val base = df
      .filter(text.isNotNull)
      .select(id.as("id"), text.as("_text"), Dedup.tokens(text).as("_toks"))
    val lines = filter(split(col("_text"), "\n"), l => trim(l) =!= "")
    // three consumers (two gram aggregations + the final join) — eager
    // localCheckpoint, not persist(): a CacheManager entry here has no
    // release handle and would accumulate across a long-lived session's
    // queries (the pipelineCuration convention)
    val lineStats = base.select(
      col("id"), col("_toks"),
      size(lines).cast("long").as("n_lines"),
      size(array_distinct(lines)).cast("long").as("_nl_dis"))
      .localCheckpoint()

    def gramStats(n: Int, prefix: String): DataFrame =
      lineStats
        .select(col("id"), explode(Dedup.gramsFromTokens(col("_toks"), n)).as("_g"))
        .groupBy("id", "_g").agg(count(lit(1)).as("_c"))
        .groupBy("id").agg(
          sum("_c").as(s"${prefix}_total"),
          count(lit(1)).as(s"${prefix}_distinct"),
          max("_c").as(s"${prefix}_top"))

    def dupFrac(dis: Column, total: Column): Column =
      coalesce(
        lit(1.0) - dis.cast("double") / total.cast("double"), lit(0.0))

    lineStats
      .join(gramStats(2, "g2"), Seq("id"), "left")
      .join(gramStats(3, "g3"), Seq("id"), "left")
      .select(
        col("id"),
        col("n_lines"),
        when(col("n_lines") > 0,
          lit(1.0) - col("_nl_dis").cast("double") / col("n_lines"))
          .otherwise(lit(0.0)).as("dup_line_frac"),
        dupFrac(col("g2_distinct"), col("g2_total")).as("dup_2gram_frac"),
        coalesce(col("g2_top").cast("double") / col("g2_total"), lit(0.0))
          .as("top_2gram_frac"),
        dupFrac(col("g3_distinct"), col("g3_total")).as("dup_3gram_frac"))
  }

  /** Fused per-document profile — language ID, quality metrics, token
    * counts, and the key-collision fingerprint in ONE corpus scan. At
    * 100 TB the scan IS the cost: running languageId + quality +
    * tokenCounts + fingerprint separately reads the corpus four times;
    * this emits all twelve signals from one projection over one
    * tokenization (CollapseProject keeps the materialized `_toks` column
    * shared because the tokenize chain is not cheap to duplicate —
    * the same single-scan shape pipeline_curation's admission stage uses).
    *
    * Semantics match the standalone operators, except documents with no
    * tokens: quality() DROPS them, while profile keeps every non-null-text
    * document and reports NULL ratios/quality (a profile exists to look
    * at exactly such rows). Null-text documents are dropped (nothing to
    * profile).
    */
  def profile(df: DataFrame, id: Column, text: Column): DataFrame = {
    val base = df.filter(text.isNotNull)
      .select(id.as("id"), text.as("_text"), Dedup.tokens(text).as("_toks"))
    val toks = col("_toks")
    val nTokens = size(toks).cast("long")
    val nChars = length(col("_text")).cast("long")
    base.select(
      col("id"),
      predLangExpr(toks).as("pred_lang"),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      when(nTokens > 0, stopwordRatioExpr(toks, nTokens)).as("stopword_ratio"),
      when(nTokens > 0, punctRatioExpr(col("_text"), nChars)).as("punct_ratio"),
      when(nTokens > 0, uniqRatioExpr(toks, nTokens)).as("uniq_ratio"),
      qualityExpr(col("_text"), toks).as("quality"),
      size(filter(split(col("_text"), s"[$WsClass]+"), t => t =!= ""))
        .cast("long").as("ws_tokens"),
      regexp_count(col("_text"), lit(BpeLikePattern)).cast("long").as("bpe_like_tokens"),
      ceil(nChars.cast("double") / 4.0).cast("long").as("est_subword_tokens"),
      md5(concat_ws(" ", array_sort(array_distinct(toks)))).as("fingerprint"))
  }

  // deterministic-aggregation convention (see graft.queries: dsum/davg):
  // any double SUM/AVG that can feed a hash compare accumulates in
  // DECIMAL(28,6) — order-independent, so the result does not depend on
  // partition/merge order — and is rounded half-up before returning to
  // double. Inlined here (operators don't depend on the queries layer).
  private val Dec = org.apache.spark.sql.types.DecimalType(28, 6)
  private def decSum(c: Column, scale: Int): Column =
    round(sum(c.cast(Dec)), scale).cast("double")
  private def decMean(c: Column, scale: Int): Column =
    round(sum(c.cast(Dec)) / count(lit(1)), scale).cast("double")
  private def decRound(c: Column, scale: Int): Column =
    round(c.cast(Dec), scale).cast("double")

  /** Unigram language-model scoring (add-one smoothing): fit token
    * unigram counts over the corpus, then score each document by its
    * per-token cross-entropy under that model,
    *
    *   ce(d) = −(1/|d|) · Σ_t ln (c(t)+1)/(N+V),   ppl(d) = exp(ce(d)),
    *
    * the classic LM-based quality signal (high cross-entropy = tokens the
    * corpus finds surprising — gibberish, boilerplate codes, wrong-corpus
    * text). Fitting and scoring the same corpus means no OOV branch; a
    * reusable model would add one (score-time tokens absent from the fit
    * vocabulary take ln 1/(N+V)).
    *
    * Scale: the fit is explode → groupBy(token) (map-side partial agg
    * absorbs stop-token heat); scoring joins occurrences to the vocabulary
    * on the token key — an equi-join Spark shuffles on, never a driver
    * structure (AQE broadcasts the vocab side when it is small enough);
    * the per-document aggregation is keyed by id, bounded by one document.
    * Only the two fit constants (N, V) land on the driver. Cross-entropy
    * accumulates through DECIMAL so the sum is partition-order-free;
    * documents with no tokens have no occurrences and are absent from the
    * output by construction.
    */
  def lmScore(df: DataFrame, id: Column, text: Column): DataFrame = {
    // two consumers each (occ: vocabulary fit + scoring join; vocab:
    // fit constants + scoring join) — eager localCheckpoint, not
    // persist(), so no unreleased CacheManager entry outlives the call
    val occ = df.filter(text.isNotNull)
      .select(id.as("id"), explode(Dedup.tokens(text)).as("token"))
      .localCheckpoint()
    val vocab = occ.groupBy("token").agg(count(lit(1)).as("c")).localCheckpoint()
    val fit = vocab.agg(
      sum(col("c")).cast("double"), count(lit(1)).cast("double")).head()
    // sum() over an empty vocab is null — a token-free corpus must yield
    // an empty result (the oracle's shape), not a driver NPE; denom is
    // never evaluated in that case (the join below has no rows)
    val denom =
      (if (fit.isNullAt(0)) 0.0 else fit.getDouble(0)) +
        fit.getDouble(1) // N + V, exact in double (count() is never null)
    occ.join(vocab, "token")
      .select(col("id"),
        (-log((col("c") + 1L).cast("double") / lit(denom))).as("_nlp"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        decMean(col("_nlp"), 6).as("cross_entropy"))
      .withColumn("perplexity", decRound(exp(col("cross_entropy")), 2))
  }

  /** Interpolated BIGRAM language-model scoring — the next modeling step
    * past [[lmScore]]'s unigram (CCNet's quality signal is a 5-gram LM;
    * the bigram captures the first-order word-order evidence a unigram is
    * blind to: scrambled text scores like fluent text under unigrams but
    * not here). Per token position,
    *
    *   p(w₁)        = (c(w₁)+1)/(N+V)                      (add-one unigram)
    *   p(wᵢ|wᵢ₋₁)   = λ·c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) + (1−λ)·(c(wᵢ)+1)/(N+V)
    *
    * (Jelinek–Mercer interpolation — the MLE bigram backed off to the
    * smoothed unigram, so an unseen-in-context pair never hits −ln 0),
    * and ce(d) = mean −ln p, ppl = exp(ce). The conditional denominator
    * is the token's TOTAL unigram count (doc-final occurrences absorb
    * their successor mass — a deterministic, documented convention both
    * engines replay).
    *
    * Scale: fit = one explode+groupBy per order (token-keyed and
    * pair-keyed — map-side partial agg absorbs stop-pair heat); scoring
    * joins occurrences to the two tables on their keys (equi-joins, AQE
    * broadcasts small vocabularies) and aggregates per id. Only (N, V)
    * land on the driver. Determinism: exact long counts, IEEE-identical
    * probability arithmetic (the same op order both engines), DECIMAL
    * accumulation for the per-doc mean.
    */
  def bigramLmScore(
      df: DataFrame, id: Column, text: Column,
      lambda: Double = 0.9): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0,1) (got $lambda)")
    val base = df.filter(text.isNotNull)
      .select(id.as("id"), Dedup.tokens(text).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .localCheckpoint() // feeds occ, firsts, and the bigram stream
    val occ = base
      .select(col("id"), explode(col("_toks")).as("w"))
      .localCheckpoint() // vocabulary fit + first-token scoring join
    val vocab = occ.groupBy("w").agg(count(lit(1)).as("c1")).localCheckpoint()
    val fit = vocab.agg(
      sum(col("c1")).cast("double"), count(lit(1)).cast("double")).head()
    val denom = fit.getDouble(0) + fit.getDouble(1) // N + V, exact in double
    // adjacent pairs per document, from the token array (per-row algebra —
    // no self-join): slice to n−1 prefixes, pair each with its successor
    val pairCol = transform(
      slice(col("_toks"), lit(1), size(col("_toks")) - 1),
      (x, i) => struct(x.as("prev"),
        element_at(col("_toks"), i + lit(2)).as("cur")))
    val bg = base
      .filter(size(col("_toks")) >= 2)
      .select(col("id"), explode(pairCol).as("pc"))
      .select(col("id"), col("pc.prev").as("prev"), col("pc.cur").as("cur"))
      .localCheckpoint() // pair fit + bigram scoring join
    val bigTable = bg.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    val firstNlp = base
      .select(col("id"), element_at(col("_toks"), 1).as("w"))
      .join(vocab, "w")
      .select(col("id"),
        (-log((col("c1") + 1L).cast("double") / lit(denom))).as("_nlp"))
    val bigNlp = bg
      .join(bigTable, Seq("prev", "cur"))
      .join(vocab.select(col("w").as("prev"), col("c1").as("_c1p")), "prev")
      .join(vocab.select(col("w").as("cur"), col("c1").as("_c1c")), "cur")
      .select(col("id"),
        (-log(
          lit(lambda) * (col("cb").cast("double") / col("_c1p").cast("double")) +
            (lit(1.0) - lit(lambda)) *
              ((col("_c1c") + 1L).cast("double") / lit(denom)))).as("_nlp"))
    // per-token values are DECIMAL-rounded PER ROW (the repo-wide dround
    // convention both engines agree on), then aggregated exactly: the
    // hash-compared signal is the EXACT per-doc sum (+count), not a
    // rounded mean — a mean can land on a half-ulp rounding boundary at
    // the target scale, where Spark (rounds the double's shortest decimal
    // repr) and DuckDB (rounds the scaled binary) flip the last digit
    // (observed on one 48-token doc in 500). cross_entropy stays in the
    // output for consumers; oracled queries compare nlp_sum.
    val sumDec = sum(decRound(col("_nlp"), 6).cast(Dec))
    firstNlp.unionByName(bigNlp)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sumDec.cast("double").as("nlp_sum"),
        round((sumDec.cast("double") / count(lit(1))).cast(Dec), 6)
          .cast("double").as("cross_entropy"),
        decRound(exp(sumDec.cast("double") / count(lit(1))), 2).as("perplexity"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing every KenLM-filtered pipeline actually ships): absolute
    * discount D off every observed bigram, redistributed through the
    * CONTINUATION probability — "how many distinct contexts precede w" —
    * which is what separates KN from [[bigramLmScore]]'s count-mixing JM:
    * a word frequent in ONE context ("Francisco") stops looking probable
    * everywhere. P(w2|w1) = max(c12−D,0)/c1 + (D·N1+(w1·)/c1)·Pcont(w2),
    * Pcont(w) = (N1+(·w)+1)/(B+V) with add-one smoothing over bigram
    * types B and vocab V; document-initial tokens score by Pcont alone.
    *
    * Same machinery and cross-engine conventions as the JM scorer: one
    * explode+groupBy per count table, equi-join scoring, per-row
    * DECIMAL-rounded −ln values summed exactly.
    */
  def knLmScore(
      df: DataFrame, id: Column, text: Column,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1) (got $discount)")
    val base = df.filter(text.isNotNull)
      .select(id.as("id"), Dedup.tokens(text).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .localCheckpoint()
    val occ = base.select(col("id"), explode(col("_toks")).as("w"))
    val vocab = occ.groupBy("w").agg(count(lit(1)).as("c1")).localCheckpoint()
    val pairCol = transform(
      slice(col("_toks"), lit(1), size(col("_toks")) - 1),
      (x, i) => struct(x.as("prev"),
        element_at(col("_toks"), i + lit(2)).as("cur")))
    val bg = base
      .filter(size(col("_toks")) >= 2)
      .select(col("id"), explode(pairCol).as("pc"))
      .select(col("id"), col("pc.prev").as("prev"), col("pc.cur").as("cur"))
      .localCheckpoint()
    val bigTable = bg.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
      .localCheckpoint() // three consumers: nFollow, nCont, scoring join
    val nFollow = bigTable.groupBy("prev").agg(count(lit(1)).as("_nf"))
    val nCont = bigTable.groupBy("cur").agg(count(lit(1)).as("_nc"))
    // B + V as one exact double — the continuation denominator
    val denomCont = bigTable.count().toDouble + vocab.count().toDouble
    val firstNlp = base
      .select(col("id"), element_at(col("_toks"), 1).as("w"))
      // a document-initial token may never occur as a bigram's `cur`
      .join(nCont.select(col("cur").as("w"), col("_nc")), Seq("w"), "left")
      .select(col("id"),
        (-log((coalesce(col("_nc"), lit(0L)) + 1L).cast("double") / lit(denomCont)))
          .as("_nlp"))
    val bigNlp = bg
      .join(bigTable, Seq("prev", "cur"))
      .join(vocab.select(col("w").as("prev"), col("c1").as("_c1p")), "prev")
      .join(nFollow, "prev")
      .join(nCont, "cur")
      .select(col("id"),
        (-log(
          (greatest(col("cb").cast("double") - lit(discount), lit(0.0)) /
            col("_c1p").cast("double")) +
            ((lit(discount) * col("_nf").cast("double") / col("_c1p").cast("double")) *
              ((col("_nc") + 1L).cast("double") / lit(denomCont))))).as("_nlp"))
    val sumDec = sum(decRound(col("_nlp"), 6).cast(Dec))
    firstNlp.unionByName(bigNlp)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sumDec.cast("double").as("nlp_sum"),
        round((sumDec.cast("double") / count(lit(1))).cast(Dec), 6)
          .cast("double").as("cross_entropy"),
        decRound(exp(sumDec.cast("double") / count(lit(1))), 2).as("perplexity"))
  }

  /** CCNet-style perplexity partitioning (Wenzek et al. LREC'20, "CCNet:
    * Extracting high quality monolingual datasets from web crawl data",
    * §4.3): score every document with the corpus LM ([[lmScore]]) and
    * split the corpus into head / middle / tail terciles by perplexity —
    * the standard quality-tiering step before mixing or filtering.
    *
    * `cutoffs` — the two tercile boundaries — default to EXACT percentiles
    * of the scored corpus (deterministic: the interpolation runs over the
    * DECIMAL-rounded perplexities both engines agree on). Exact percentile
    * aggregates every value into one buffer, which is fine per-language at
    * CCNet's own scale but not at 10¹¹ docs — there, pass cutoffs fitted
    * on a deterministic sample (the paper itself fits them on one Common
    * Crawl segment) and the whole operator is a single per-row CASE over
    * broadcast literals.
    *
    * Output: lmScore's columns plus `ppl_bucket` ∈ head|middle|tail.
    */
  def ccnetBuckets(
      df: DataFrame, id: Column, text: Column,
      cutoffs: Option[(Double, Double)] = None): DataFrame = {
    val scored = cutoffs match {
      case Some(_) => lmScore(df, id, text)
      // two consumers (percentile agg + bucketing) — eager localCheckpoint,
      // the lmScore/Packing row-stability convention
      case None => lmScore(df, id, text).localCheckpoint()
    }
    val (c1, c2) = cutoffs.getOrElse {
      val r = scored
        .agg(expr("percentile(perplexity, array(1.0D/3, 2.0D/3))")).head()
      if (r.isNullAt(0)) (Double.NaN, Double.NaN) // token-free corpus: no rows
      else { val q = r.getSeq[Double](0); (q(0), q(1)) }
    }
    scored.withColumn("ppl_bucket",
      when(col("perplexity") <= c1, "head")
        .when(col("perplexity") <= c2, "middle")
        .otherwise("tail"))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS'23): features are
    * word unigrams + bigrams hashed into `buckets` buckets; fit two
    * add-one-smoothed bag-of-hashed-ngrams distributions — `p` over the
    * TARGET slice (`isTarget`), `q` over the rest ("raw") — and score each
    * raw document by its log importance weight
    *
    *   log w(d) = Σ_g  ln p(bucket(g)) − ln q(bucket(g)),
    *
    * the raw-corpus reweighting signal for target-matched sampling (feed
    * `log_weight` to [[Sampling]] with Gumbel/threshold selection).
    *
    * Scale: feature build is per-row array algebra + explode (narrow); the
    * bucket table is ≤ `buckets` rows — broadcast to the scoring join, so
    * scoring never shuffles anything but the per-doc aggregation, which is
    * id-keyed and bounded by one document's features. Only the two fit
    * totals land on the driver. Documents with no tokens produce no
    * features and are absent (no evidence to weigh).
    */
  def dsirWeights(df: DataFrame, id: Column, text: Column, isTarget: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    val base = df.filter(text.isNotNull)
      .select(id.as("id"), isTarget.as("_t"), Dedup.tokens(text).as("_toks"))
    // one primitive loop per document: hash every unigram and bigram with
    // a single reused MessageDigest — the interpreted-HOF gram build plus
    // a per-gram Column md5 costs ~3× this at scale (the same
    // primitive-loop fix that collapsed the minhash signature stage).
    // Same bytes hashed (token, "a b" bigram), so buckets are unchanged.
    val featUdf = udf { (toks: Seq[String]) =>
      if (toks == null || toks.isEmpty) Array.empty[Long]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val n = toks.length
        val out = new Array[Long](2 * n - 1)
        var i = 0
        while (i < n) { out(i) = Dedup.hash60Local(md, toks(i)) % buckets; i += 1 }
        var j = 0
        while (j < n - 1) {
          out(n + j) = Dedup.hash60Local(md, toks(j) + " " + toks(j + 1)) % buckets
          j += 1
        }
        out
      }
    }
    // two consumers each (feats: bucket fit + raw-doc scoring; tab:
    // totals + log-ratio table) — eager localCheckpoint, not persist(),
    // so no unreleased CacheManager entry outlives the call
    val feats = base
      .select(col("id"), col("_t"), explode(featUdf(col("_toks"))).as("b"))
      .localCheckpoint()
    val tab = feats.groupBy("b").agg(
        sum(when(col("_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("_t"), 0L).otherwise(1L)).as("cr"))
      .localCheckpoint()
    val tot = tab.agg(
      sum(col("ct")).cast("double"), sum(col("cr")).cast("double")).head()
    // empty corpus → null sums; 0.0 keeps the (row-less) plan valid and
    // the output empty instead of NPE-ing the driver
    def orZero(i: Int): Double = if (tot.isNullAt(i)) 0.0 else tot.getDouble(i)
    val (nt, nr, bd) = (orZero(0), orZero(1), buckets.toDouble)
    val ratios = tab.select(col("b"),
      (log((col("ct") + 1L).cast("double") / lit(nt + bd)) -
        log((col("cr") + 1L).cast("double") / lit(nr + bd))).as("_lr"))
    feats.filter(!col("_t"))
      .join(broadcast(ratios), "b")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_feats"),
        decSum(col("_lr"), 6).as("log_weight"))
  }

  /** PII patterns — deliberately ASCII-only so Java regex (Spark) and RE2
    * (DuckDB oracles) agree byte-for-byte: emails, dotted-quad IPv4, and
    * phone-shaped digit runs. Pattern-level detection: `999.999.999.999`
    * matches the IPv4 SHAPE — a redaction pass wants recall over dotted
    * quads, not RFC validity.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
  val PhonePattern = "\\+?[0-9][0-9(). -]{6,}[0-9]"

  /** PII scan + redaction: per document, the match counts and the text
    * with PII replaced by `<EMAIL>`/`<IP>`/`<PHONE>` placeholders. The
    * three passes run SEQUENTIALLY (emails, then IPv4 over the
    * email-redacted text, then phones) so the broader phone pattern can
    * never swallow a dotted quad and each count is over the text the
    * corresponding replace actually saw — the oracle replays the same
    * order. Placeholders carry no digits, so a later pass cannot match
    * inside an earlier redaction. Pure per-row Column algebra: narrow,
    * codegen-friendly, no shuffle, trivially 100 TB-safe.
    */
  def piiScan(df: DataFrame, id: Column, text: Column): DataFrame = {
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    df.filter(text.isNotNull).select(
      id.as("id"),
      regexp_count(text, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(Ipv4Pattern)).cast("long").as("n_ipv4"),
      regexp_count(afterIp, lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_replace(afterIp, PhonePattern, "<PHONE>").as("redacted"))
  }

  /** Gopher stopwords (Rae et al. 2021 §A.1.1: "the, be, to, of, and,
    * that, have, with") — distinct from the quality-score stopword list
    * on purpose; the rule family is the published one.
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-rule quality filter (Rae et al. 2021, "Scaling Language
    * Models", Appendix A1.1) — the published repetition-free document
    * rules, each emitted as a signal so downstream policy can re-threshold
    * without rescanning:
    *
    *  - `n_words` in [minWords, maxWords]           (paper: 50..100 000)
    *  - `mean_word_len` in [3, 10]
    *  - `symbol_ratio` (# or ... per word) ≤ 0.1
    *  - `bullet_ratio` (lines starting with a bullet, dash, or star) ≤ 0.9
    *  - `ellipsis_ratio` (lines ending ...) ≤ 0.3
    *  - `alpha_ratio` (words with ≥1 letter) ≥ 0.8
    *  - `stop_hits` (Gopher stopword occurrences) ≥ 2
    *
    * "Words" are WHITESPACE tokens (the paper's unit), not analyzer
    * tokens; `mean_word_len` = non-whitespace chars / words, which equals
    * the mean over maximal non-ws runs without materializing per-word
    * lengths. Pure per-row Column algebra — narrow, codegen-friendly, no
    * shuffle, trivially 100 TB-safe. Ratios round through DECIMAL for the
    * cross-engine hash compare (see the convention note below).
    */
  def gopherFilter(
      df: DataFrame, id: Column, text: Column,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val base = df.filter(text.isNotNull).select(
      id.as("id"), text.as("_text"),
      filter(split(text, s"[$WsClass]+"), w => w =!= "").as("_ws"))
    val nWords = size(col("_ws")).cast("long")
    val lines = filter(transform(split(col("_text"), "\n"), l => trim(l)),
      l => l =!= "")
    val nLines = size(lines)
    // '#' count + non-overlapping '...' count (replace removes left-to-
    // right non-overlapping occurrences in BOTH engines, so the /3 is a
    // whole number by construction)
    val symbols =
      (length(col("_text")) - length(regexp_replace(col("_text"), "#", ""))) +
        (length(col("_text")) - length(regexp_replace(col("_text"), "\\.\\.\\.", ""))) / 3
    val alphaWords = size(filter(col("_ws"), w => w.rlike("\\p{L}")))
    val bulletLines = size(filter(lines,
      l => substring(l, 1, 1).isin("•", "-", "*")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    val meanWordLen =
      length(regexp_replace(col("_text"), s"[$WsClass]", "")).cast("double") / nWords
    val symbolRatio = symbols.cast("double") / nWords
    val bulletRatio = bulletLines.cast("double") / nLines
    val ellipsisRatio = ellipsisLines.cast("double") / nLines
    val alphaRatio = alphaWords.cast("double") / nWords
    val stopHits = size(filter(col("_ws"),
      w => lower(w).isin(GopherStops: _*))).cast("long")
    base.filter(nWords > 0).select(
      col("id"),
      nWords.as("n_words"),
      decRound(meanWordLen, 4).as("mean_word_len"),
      decRound(symbolRatio, 4).as("symbol_ratio"),
      decRound(bulletRatio, 4).as("bullet_ratio"),
      decRound(ellipsisRatio, 4).as("ellipsis_ratio"),
      decRound(alphaRatio, 4).as("alpha_ratio"),
      stopHits.as("stop_hits"),
      (nWords.between(minWords, maxWords) &&
        meanWordLen.between(3.0, 10.0) &&
        symbolRatio <= 0.1 &&
        bulletRatio <= 0.9 &&
        ellipsisRatio <= 0.3 &&
        alphaRatio >= 0.8 &&
        stopHits >= 2L).as("pass"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2) — per page:
    * keep only lines that end in terminal punctuation (`.` `!` `?` `"`),
    * contain ≥ `minWordsPerLine` whitespace words (paper: 5), and do not
    * mention "javascript" (case-insensitive); drop the whole page if it
    * contains "lorem ipsum" (case-insensitive) or a curly brace `{`.
    *
    * Emits the per-rule drop counts plus `clean_text` (kept lines
    * re-joined with \n; NULL when the page is dropped or no line
    * survives) so the operator doubles as an audit. Line rules apply in
    * the order short → punct → javascript: each counter counts lines the
    * EARLIER rules already passed, so the three counters + n_kept sum to
    * n_lines and the oracle replays one branch per line. Pure per-row
    * Column algebra — narrow, no shuffle, 100 TB-safe.
    */
  def c4Clean(
      df: DataFrame, id: Column, text: Column,
      minWordsPerLine: Int = 5): DataFrame = {
    val base = df.filter(text.isNotNull).select(
      id.as("id"), text.as("_text"),
      filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
        .as("_lines"))
    def lineWords(l: Column): Column =
      size(filter(split(l, s"[$WsClass]+"), w => w =!= ""))
    def shortL(l: Column): Column = lineWords(l) < minWordsPerLine
    def punctL(l: Column): Column =
      !substring(l, -1, 1).isin(".", "!", "?", "\"")
    def jsL(l: Column): Column = lower(l).contains("javascript")
    val kept = filter(col("_lines"), l => !shortL(l) && !punctL(l) && !jsL(l))
    val pageOk = !lower(col("_text")).contains("lorem ipsum") &&
      !col("_text").contains("{")
    base.select(
      col("id"),
      size(col("_lines")).cast("long").as("n_lines"),
      size(filter(col("_lines"), l => shortL(l))).cast("long")
        .as("n_short"),
      size(filter(col("_lines"), l => !shortL(l) && punctL(l))).cast("long")
        .as("n_nopunct"),
      size(filter(col("_lines"), l => !shortL(l) && !punctL(l) && jsL(l)))
        .cast("long").as("n_js"),
      size(kept).cast("long").as("n_kept"),
      pageOk.as("page_ok"),
      when(pageOk && size(kept) > 0, array_join(kept, "\n")).as("clean_text"))
  }

  /** Corpus vocabulary: per-token total occurrences and document frequency
    * — the tokenizer-training / vocab-pruning precursor (BPE corpus prep
    * starts exactly here). One explode + one groupBy: the shuffle key is
    * the token, counts combine map-side, and `minCount` prunes the long
    * tail BEFORE any ordering. Deterministic order: (count desc, token
    * asc).
    */
  def vocabulary(
      df: DataFrame, id: Column, text: Column, minCount: Long = 1L): DataFrame =
    df.select(id.as("_vid"), explode(Dedup.tokens(text)).as("token"))
      .groupBy("token")
      .agg(
        count(lit(1)).as("occurrences"),
        countDistinct(col("_vid")).as("doc_freq"))
      .filter(col("occurrences") >= minCount)
      .orderBy(col("occurrences").desc, col("token").asc)

  /** BM25 ranking (Robertson et al., Okapi; idf in the non-negative
    * `ln(1 + (N-df+0.5)/(df+0.5))` form) — the standard successor to the
    * reference's tf-idf text scoring (reference shard/index/text/
    * text.go:367–371 computes `(f/len)·log10(N/(df+1))`; same analyzed
    * postings, different weighting). Query text goes through the SAME
    * analyzer as the corpus ([[graft.functions.TextAnalyzer]]), so
    * stopwords and case fold identically on both sides of the match.
    *
    * Returns the top-`k` docs by `(score32 desc, id asc)` as
    * (id, score32): the double-summed score is collapsed to float32
    * before ranking — per-term addition order across partitions is not
    * deterministic in the last double ulp, and the float cast (like the
    * engine's float32 `_score` surface) makes the ranking and the
    * DuckDB replay agree bit-for-bit.
    *
    * Scale: one corpus tokenize+explode feeds a (id, term) groupBy with
    * map-side combine; corpus stats (N, avgdl) are a one-row broadcast;
    * the per-query-term df table is broadcast-sized by construction;
    * the final top-k is TakeOrderedAndProject (partial per partition,
    * merge on the driver) — no global sort.
    */
  def bm25(
      df: DataFrame, id: Column, text: Column, queryText: String,
      k1: Double = 1.2, b: Double = 0.75, k: Int = 20): DataFrame = {
    val terms = graft.functions.TextAnalyzer.analyzeString(queryText).distinct
    require(terms.nonEmpty, s"query analyzes to zero terms: '$queryText'")
    // explode_outer: zero-term docs keep one null-term row so corpus
    // stats (N, avgdl) count every non-null document (the engine's
    // TextIndex uses the same convention); a null term never joins a
    // query term, so these rows are inert in scoring
    val grouped = df.filter(text.isNotNull)
      .select(id.as("id"), graft.functions.TextAnalyzer.analyze(text).as("_terms"))
      .select(col("id"), size(col("_terms")).as("_dl"),
        explode_outer(col("_terms")).as("_term"))
      .groupBy("id", "_dl", "_term").agg(count(lit(1)).as("_tf"))
      // three consumers (stats, dfreq, scoring) — eager localCheckpoint
      // per the shared-frame rule, and the corpus pays ONE tokenize pass
      .localCheckpoint()
    val stats = grouped.select("id", "_dl").distinct()
      .agg(count(lit(1)).as("_n"),
        (sum(col("_dl")).cast("double") / count(lit(1))).as("_avgdl"))
    val dfreq = grouped.filter(col("_term").isin(terms: _*))
      .groupBy("_term").agg(count(lit(1)).as("_df"))
    val tfD = col("_tf").cast("double")
    val contrib =
      log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5)) *
        (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))
    grouped.filter(col("_term").isin(terms: _*))
      .join(broadcast(dfreq), Seq("_term"))
      .crossJoin(broadcast(stats))
      .groupBy("id")
      .agg(sum(contrib).cast("float").as("score32"))
      .orderBy(col("score32").desc, col("id").asc)
      .limit(k)
  }

  /** Line-terminal punctuation the FineWeb filter tests for (Penedo et
    * al. 2024 §3.3 — `. ' " ! ?`).
    */
  val FineWebPunct: Set[Char] = Set('.', '\'', '"', '!', '?')

  // one compiled pass over the line array: (n_lines, punct_lines,
  // short_lines, dup_chars, line_chars) — the same single-pass rule as
  // tokStatsUdf (an interpreted filter per ratio would walk the array
  // once per component)
  private val fineWebStatsUdf = udf { (lines: Seq[String]) =>
    if (lines == null || lines.isEmpty) None
    else {
      var punct = 0L; var short = 0L; var chars = 0L
      val seen = new java.util.HashMap[String, Long]()
      lines.foreach { l =>
        if (l.nonEmpty && FineWebPunct.contains(l.charAt(l.length - 1))) punct += 1
        if (l.length <= 30) short += 1
        chars += l.length
        if (l.nonEmpty) seen.merge(l, 1L, _ + _)
      }
      var dup = 0L
      seen.forEach { (line, cnt) => if (cnt > 1) dup += (cnt - 1) * line.length }
      Some((lines.length.toLong, punct, short, dup, chars))
    }
  }

  /** The FineWeb quality-filter family (Penedo et al. 2024, "The FineWeb
    * Datasets", §3.3 custom filters — the published default thresholds):
    * a document is KEPT when
    *  - the fraction of lines ending in terminal punctuation
    *    ([[FineWebPunct]]) is ≥ 0.12,
    *  - the fraction of lines of ≤ 30 characters is < 0.67,
    *  - the fraction of line characters belonging to DUPLICATED lines
    *    (each repeat of an already-seen non-empty line contributes its
    *    length) is < 0.01, and
    *  - the newline-to-word ratio ((n_lines − 1) / words) is ≤ 0.3.
    *
    * Takes an explicit LINE-ARRAY column plus a word count, so corpora
    * without layout can synthesize lines deterministically (the gate
    * chunks the token stream) and real multi-line corpora pass
    * `split(text, "\n")`. Ratios are IEEE divisions of exact counts —
    * both engines compute bit-identical values, so the pass flag needs
    * no rounding convention. Pure per-row algebra; no shuffle.
    */
  def fineWebQuality(
      df: DataFrame, id: Column, lines: Column, words: Column): DataFrame = {
    val st = fineWebStatsUdf(lines)
    df.select(id.as("id"), st.as("_st"), words.cast("long").as("words"))
      .filter(col("_st").isNotNull)
      .select(col("id"), col("words"),
        col("_st").getField("_1").as("n_lines"),
        (col("_st").getField("_2").cast("double") /
          col("_st").getField("_1").cast("double")).as("line_punct_r"),
        (col("_st").getField("_3").cast("double") /
          col("_st").getField("_1").cast("double")).as("short_line_r"),
        // all-empty-line and zero-word docs define their ratios as 0,
        // not NaN (the SQL oracle mirrors the CASE)
        when(col("_st").getField("_5") === 0L, lit(0.0))
          .otherwise(col("_st").getField("_4").cast("double") /
            col("_st").getField("_5").cast("double")).as("dup_char_r"),
        when(col("words") === 0L, lit(0.0))
          .otherwise((col("_st").getField("_1").cast("double") - 1.0) /
            col("words").cast("double")).as("nl_word_r"))
      .withColumn("passes",
        col("line_punct_r") >= 0.12 && col("short_line_r") < 0.67 &&
          col("dup_char_r") < 0.01 && col("nl_word_r") <= 0.3)
  }
}
