package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dedup operator queries over `documents`/`embeddings`, each with a DuckDB
  * oracle replaying the identical md5-based pipeline in SQL. The testdata
  * plants 25 near-duplicate document pairs (3-gram jaccard ≈ 0.98) that
  * every near-dup method must surface.
  */
object DedupQueries {

  /** Shared SQL: tokens and distinct 3-gram shingles per doc. */
  private val shingleCte =
    s"""tok AS (
      |  SELECT doc_id, $sqlRawToks AS raw
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(raw) >= 3
      |      THEN list_transform(range(1, len(raw) - 1),
      |           i -> raw[i] || ' ' || raw[i+1] || ' ' || raw[i+2])
      |      ELSE [] END) AS sh3
      |  FROM tok)""".stripMargin

  val dedupExact = NamedQuery(
    "dedup_exact",
    """SELECT count(*) AS n_total, count(DISTINCT md5(text)) AS n_distinct,
      |  (SELECT count(*) FROM (
      |     SELECT md5(text) k FROM documents GROUP BY 1 HAVING count(*) > 1)) AS n_dup_groups
      |FROM documents""".stripMargin) { (s, d) =>
    Dedup.exactStats(Tables.documents(s, d), col("text"))
  }

  val dedupNgramJaccard = NamedQuery(
    "dedup_ngram_jaccard",
    s"""WITH $shingleCte,
       |posts AS (SELECT doc_id, len(sh3) AS cnt, unnest(sh3) AS s FROM sh WHERE len(sh3) > 0),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.cnt AS ca, b.cnt AS cb,
       |         count(*) AS common
       |  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT id_a, id_b,
       |  CAST(round(CAST(CAST(common AS DOUBLE) / (ca + cb - common) AS DECIMAL(28,6)), 4) AS DOUBLE) AS jaccard_r
       |FROM pairs
       |WHERE CAST(common AS DOUBLE) / (ca + cb - common) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, d), col("doc_id"), col("text"),
        n = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"), dround(col("jaccard"), 4).as("jaccard_r"))
      .orderBy("id_a", "id_b")
  }

  /** Duplicate CLUSTERS: the ngram-jaccard pairs as an undirected graph,
    * components via alternating large-star/small-star, labeled by the
    * component's min doc id — the step that turns pair detection into a
    * dedup policy (keep one doc per cluster). The oracle replays the same
    * pair pipeline and closes it transitively with a recursive CTE.
    */
  val dedupClusters = NamedQuery(
    "dedup_clusters",
    s"""WITH RECURSIVE $shingleCte,
       |posts AS (SELECT doc_id, len(sh3) AS cnt, unnest(sh3) AS s FROM sh WHERE len(sh3) > 0),
       |prs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.cnt AS ca, b.cnt AS cb,
       |         count(*) AS common
       |  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |good AS (
       |  SELECT id_a, id_b FROM prs
       |  WHERE CAST(common AS DOUBLE) / (ca + cb - common) >= 0.5),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM good
       |  UNION SELECT id_b, id_a FROM good),
       |reach(node, r) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node),
       |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY 1),
       |sizes AS (SELECT component, count(*) AS csize FROM comp GROUP BY 1)
       |SELECT c.node AS doc_id, c.component, s.csize
       |FROM comp c JOIN sizes s USING (component)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, d), col("doc_id"), col("text"),
      n = 3, threshold = 0.5)
    val comp = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("csize"))
    comp.join(sizes, "component")
      .select(col("node").as("doc_id"), col("component"), col("csize"))
      .orderBy("doc_id")
  }

  /** The 2-universal minhash family: perm j of shingle s is
    * (h1 + j·h2) mod (2^31−1) with h1/h2 = 30-bit md5-prefix hashes.
    */
  private val sigCte =
    """posts AS (
      |  SELECT doc_id, s,
      |    CAST(('0x' || substr(md5(s || '#1'), 1, 15)) AS BIGINT) % 1073741824 AS h1,
      |    CAST(('0x' || substr(md5(s || '#2'), 1, 15)) AS BIGINT) % 1073741824 AS h2
      |  FROM (SELECT doc_id, unnest(sh3) AS s FROM sh WHERE len(sh3) > 0)),
      |perms AS (SELECT unnest(range(0, 16)) AS perm),
      |sigs AS (
      |  SELECT doc_id AS id, perm,
      |    min((h1 + perm * h2) % 2147483647) AS minhash
      |  FROM posts CROSS JOIN perms GROUP BY 1, 2)""".stripMargin

  val dedupMinhashSig = NamedQuery(
    "dedup_minhash_sig",
    s"""WITH $shingleCte,
       |$sigCte
       |SELECT id, perm, minhash FROM sigs WHERE id < 100 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Dedup.minhashSignatures(
        Tables.documents(s, d).filter(col("doc_id") < 100), col("doc_id"), col("text"))
      .orderBy("id", "perm")
  }

  val dedupMinhashLsh = NamedQuery(
    "dedup_minhash_lsh",
    s"""WITH $shingleCte,
       |$sigCte,
       |banded AS (
       |  SELECT id, perm // 4 AS band,
       |         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm)) AS bandkey
       |  FROM sigs GROUP BY id, perm // 4),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bandkey = b.bandkey AND a.id < b.id),
       |verified AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE) / 16 AS est
       |  FROM cand c
       |  JOIN sigs sa ON sa.id = c.id_a
       |  JOIN sigs sb ON sb.id = c.id_b AND sb.perm = sa.perm
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  CAST(round(CAST(est AS DECIMAL(28,6)), 4) AS DOUBLE) AS est_r
       |FROM verified WHERE est >= 0.5 ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val sigs = Dedup.minhashSigArrays(Tables.documents(s, d), col("doc_id"), col("text"))
    Dedup.minhashLshPairs(sigs, perms = 16, bandRows = 4, threshold = 0.5)
      .select(col("id_a"), col("id_b"), dround(col("est_jaccard"), 4).as("est_r"))
      .orderBy("id_a", "id_b")
  }

  /** Winnowing-sketch near-dup pairs: the rolling-hash fingerprint
    * (text_winnow) as a dedup policy — pairs sharing ≥ 5 distinct sketch
    * hashes. Joins ~40% of the rows the shingle join shuffles (density 2/(w+1)).
    */
  val dedupWinnow = NamedQuery(
    "dedup_winnow",
    s"""WITH $winnowSelCte,
       |dsel AS (SELECT DISTINCT id, mn FROM sel),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
       |  FROM dsel a JOIN dsel b ON a.mn = b.mn AND a.id < b.id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, shared FROM pairs WHERE shared >= 5
       |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val sketch = graft.operators.TextAnalysis.winnow(
      Tables.documents(s, d), col("doc_id"), col("text"), n = 3, window = 4)
    graft.operators.TextAnalysis.winnowPairs(sketch, minShared = 5)
      .orderBy("id_a", "id_b")
  }

  val dedupSimhash = NamedQuery(
    "dedup_simhash",
    s"""WITH tok AS (
      |  SELECT doc_id, unnest($sqlRawToks) AS t
      |  FROM documents),
      |posts AS (
      |  SELECT doc_id, t, count(*) AS freq,
      |    CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
      |  FROM tok GROUP BY doc_id, t),
      |bits AS (
      |  SELECT doc_id, j,
      |    sum(CASE WHEN ((h >> j) & 1) = 1 THEN freq ELSE -freq END) AS s
      |  FROM posts CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
      |  GROUP BY doc_id, j)
      |SELECT doc_id AS id,
      |  CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      |FROM bits GROUP BY doc_id ORDER BY id""".stripMargin) { (s, d) =>
    Dedup.simhash(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderBy("id")
  }

  val dedupEmbCosine = NamedQuery(
    "dedup_emb_cosine",
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS block,
      |  CAST(round(CAST(
      |    list_sum(list_transform(range(1, 65), t -> CAST(a.embedding[t] AS DOUBLE) * CAST(b.embedding[t] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(range(1, 65), t -> CAST(a.embedding[t] AS DOUBLE) * CAST(a.embedding[t] AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(range(1, 65), t -> CAST(b.embedding[t] AS DOUBLE) * CAST(b.embedding[t] AS DOUBLE)))))
      |    AS DECIMAL(28,6)), 4) AS DOUBLE) AS sim_r
      |FROM embeddings a JOIN embeddings b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(range(1, 65), t -> CAST(a.embedding[t] AS DOUBLE) * CAST(b.embedding[t] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(range(1, 65), t -> CAST(a.embedding[t] AS DOUBLE) * CAST(a.embedding[t] AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(range(1, 65), t -> CAST(b.embedding[t] AS DOUBLE) * CAST(b.embedding[t] AS DOUBLE))))) >= 0.3
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    Dedup.embeddingCosinePairs(Tables.embeddings(s, d),
        col("vec_id"), col("embedding"), col("label"), threshold = 0.3)
      .select(col("id_a"), col("id_b"), col("block"),
        dround(col("cosine_sim"), 4).as("sim_r"))
      .orderBy("id_a", "id_b")
  }

  /** Cross-corpus line dedup at maxDf=1: only globally-unique non-blank
    * lines survive. On this corpus every document is one line, so the
    * members of the single exact-duplicate group lose their line
    * (n_kept=0, NULL text) — the whole-doc degenerate case; DedupSpec
    * carries the multi-line semantics.
    */
  val dedupLines = NamedQuery(
    "dedup_lines",
    """WITH d AS (
      |  SELECT doc_id AS id,
      |    list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ls
      |  FROM documents WHERE text IS NOT NULL),
      |l AS (
      |  SELECT id, i AS pos, ls[i] AS line
      |  FROM d CROSS JOIN unnest(range(1, len(ls) + 1)) AS r(i)),
      |hot AS (
      |  SELECT line FROM (SELECT line, count(*) AS c FROM l GROUP BY line)
      |  WHERE c > 1),
      |k AS (SELECT * FROM l WHERE line NOT IN (SELECT line FROM hot)),
      |agg AS (
      |  SELECT id, count(*) AS n_kept,
      |    md5(string_agg(line, chr(10) ORDER BY pos)) AS kept_md5
      |  FROM k GROUP BY id)
      |SELECT d.id, CAST(len(d.ls) AS BIGINT) AS n_lines,
      |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept, a.kept_md5
      |FROM d LEFT JOIN agg a USING (id) ORDER BY id""".stripMargin) { (s, d) =>
    Dedup.lineDedup(Tables.documents(s, d), col("doc_id"), col("text"), maxDf = 1L)
      .select(col("id"), col("n_lines"), col("n_kept"),
        md5(col("kept_text")).as("kept_md5"))
      .orderBy("id")
  }

  /** SemDeDup over the embeddings table: 6-bit sign cells as the
    * deterministic stand-in for the paper's k-means clustering (the
    * ann_ivf_grid convention — DuckDB replays the cell expression
    * exactly), true-cosine ≥ 0.3 within a cell, dominated-by-earlier-id
    * drop. Both engines compute the dot/norms in the same exact-double
    * order, so the threshold compare cannot straddle engines.
    */
  val dedupSemantic = {
    val sqlCell =
      (0 until 6).map(i =>
        s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END")
        .mkString(" + ")
    val sqlDot =
      "list_sum(list_transform(range(1, 65), t -> CAST(a.embedding[t] AS DOUBLE) * CAST(b.embedding[t] AS DOUBLE)))"
    def sqlNorm(side: String) =
      s"sqrt(list_sum(list_transform(range(1, 65), t -> CAST($side.embedding[t] AS DOUBLE) * CAST($side.embedding[t] AS DOUBLE))))"
    NamedQuery(
      "dedup_semantic",
      s"""WITH c AS (
        |  SELECT vec_id AS id, embedding, ($sqlCell) AS cell
        |  FROM embeddings),
        |dom AS (
        |  SELECT b.id, max($sqlDot / (${sqlNorm("a")} * ${sqlNorm("b")})) AS drop_sim
        |  FROM c a JOIN c b ON a.cell = b.cell AND a.id < b.id
        |  WHERE $sqlDot / (${sqlNorm("a")} * ${sqlNorm("b")}) >= 0.3
        |  GROUP BY b.id)
        |SELECT c.id, CAST(c.cell AS BIGINT) AS cell,
        |  dom.drop_sim IS NULL AS kept,
        |  CAST(round(CAST(dom.drop_sim AS DECIMAL(28,6)), 4) AS DOUBLE) AS drop_sim_r
        |FROM c LEFT JOIN dom USING (id) ORDER BY c.id""".stripMargin) { (s, d) =>
      Dedup.semDedup(Tables.embeddings(s, d), col("vec_id"), col("embedding"),
          graft.operators.Similarity.signBucket(col("embedding"), 6), tau = 0.3)
        .select(col("id"), col("cell").cast("long").as("cell"), col("kept"),
          dround(col("drop_sim"), 4).as("drop_sim_r"))
        .orderBy("id")
    }
  }

  /** Exact content dedup ON INGEST — the streaming face of dedup_exact,
    * over a real Structured Stream of the events table (the q8_stream_score
    * parity contract: streaming must be a deployment choice, not a
    * semantics change). A stateful groupBy on the content hash emits one
    * row per DISTINCT payload with its duplicate count and min-id keeper —
    * deterministic regardless of arrival order inside micro-batches, which
    * a raw dropDuplicates("content") is not (the surviving ROW there is
    * whichever arrives first). DuckDB replays the identical aggregation
    * over the batch table. The synthetic corpus makes this meaningful:
    * 10k events share 100 distinct payloads.
    */
  val q9StreamDedup = NamedQuery(
    "q9_stream_dedup",
    """SELECT md5(props) AS content_md5, count(*) AS n_dups,
      |  min(event_id) AS keeper_id
      |FROM events WHERE props IS NOT NULL
      |GROUP BY 1 ORDER BY content_md5""".stripMargin) { (s, d) =>
    graft.streaming.EventsStream.runAsStream(s, d, ev =>
        ev.filter(col("props").isNotNull)
          .groupBy(md5(col("props")).as("content_md5"))
          .agg(count(lit(1)).as("n_dups"), min(col("event_id")).as("keeper_id")),
        outputMode = "complete")
      .orderBy("content_md5")
  }

  /** Exact substring duplication (Lee et al. 2022 ExactSubstr family,
    * n=15 token windows): per-doc duplicated-window counts and the
    * token-coverage fraction of the duplicated spans. The oracle replays
    * the identical pipeline — same md5-prefix window hash, same
    * interval-union coverage formula over sorted duplicated starts.
    */
  val dedupSubstring = NamedQuery(
    "dedup_substring",
    s"""WITH tok AS (SELECT doc_id AS id, $sqlRawToks AS raw FROM documents),
       |base AS (
       |  SELECT id, CAST(COALESCE(len(raw), 0) AS BIGINT) AS n_toks,
       |    CAST(greatest(COALESCE(len(raw), 0) - 14, 0) AS BIGINT) AS n_windows
       |  FROM tok),
       |posts AS (
       |  SELECT id, CAST(i AS BIGINT) AS pos,
       |    CAST(('0x' || substr(md5(array_to_string(raw[i:i+14], ' ')), 1, 15)) AS BIGINT) AS wh
       |  FROM tok CROSS JOIN unnest(range(1, len(raw) - 13)) AS t(i)
       |  WHERE len(raw) >= 15),
       |dup AS (SELECT wh FROM posts GROUP BY wh HAVING count(*) > 1),
       |docdup AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS n_dup_windows,
       |    list_sort(list(pos)) AS s
       |  FROM posts JOIN dup USING (wh) GROUP BY id),
       |cov AS (
       |  SELECT id, n_dup_windows,
       |    CAST(15 + COALESCE(list_sum(list_transform(range(1, len(s)),
       |      i -> least(15, s[i+1] - s[i]))), 0) AS BIGINT) AS covered_toks
       |  FROM docdup)
       |SELECT b.id, b.n_toks, b.n_windows,
       |  COALESCE(c.n_dup_windows, 0) AS n_dup_windows,
       |  COALESCE(c.covered_toks, 0) AS covered_toks,
       |  CASE WHEN b.n_toks > 0 THEN ${sqlDround("COALESCE(c.covered_toks, 0) / b.n_toks")} END AS dup_frac_r
       |FROM base b LEFT JOIN cov c USING (id)
       |ORDER BY id""".stripMargin) { (s, d) =>
    Dedup.substringDupStats(Tables.documents(s, d), col("doc_id"), col("text"), n = 15)
      .orderBy("id")
  }

  /** Per-source boilerplate removal over a corpus where every document of
    * a source carries that source's banner line (injected identically by
    * both engines — the testdata has no natural per-source chrome, and a
    * vacuous pass-through would gate nothing): the banner appears in 100%
    * of its stratum's documents and must be cut, while every original
    * line (per-source df = 1) must survive in order. The hash covers the
    * reconstructed text via md5.
    */
  val textBoilerplate = NamedQuery(
    "text_boilerplate",
    """WITH d0 AS (
      |  SELECT doc_id AS id, source,
      |    source || ' NEWSLETTER FOOTER' || chr(10) || text AS text
      |  FROM documents WHERE text IS NOT NULL),
      |d AS (
      |  SELECT id, source AS stratum,
      |    list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ls
      |  FROM d0),
      |l AS (
      |  SELECT id, stratum, i AS pos, ls[i] AS line
      |  FROM d CROSS JOIN unnest(range(1, len(ls) + 1)) AS r(i)),
      |docs AS (SELECT stratum, count(*) AS n_docs FROM d GROUP BY stratum),
      |pres AS (
      |  SELECT stratum, line, count(*) AS ldf
      |  FROM (SELECT DISTINCT id, stratum, unnest(ls) AS line FROM d)
      |  GROUP BY stratum, line),
      |hot AS (
      |  SELECT p.stratum, p.line FROM pres p JOIN docs USING (stratum)
      |  WHERE p.ldf >= 10 AND p.ldf > 0.5 * n_docs),
      |k AS (
      |  SELECT l.* FROM l LEFT JOIN hot h
      |    ON l.stratum = h.stratum AND l.line = h.line
      |  WHERE h.line IS NULL),
      |agg AS (
      |  SELECT id, count(*) AS n_kept,
      |    md5(string_agg(line, chr(10) ORDER BY pos)) AS kept_md5
      |  FROM k GROUP BY id)
      |SELECT d.id, d.stratum, CAST(len(d.ls) AS BIGINT) AS n_lines,
      |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept, a.kept_md5
      |FROM d LEFT JOIN agg a USING (id) ORDER BY id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        concat(col("source"), lit(" NEWSLETTER FOOTER\n"), col("text")).as("text"))
    Dedup.boilerplate(docs, col("doc_id"), col("text"), col("source"),
        minDocs = 10L, frac = 0.5)
      .select(col("id"), col("stratum"), col("n_lines"), col("n_kept"),
        md5(col("kept_text")).as("kept_md5"))
      .orderBy("id")
  }

  /** Incremental-ingest novelty via the sharded Bloom filter: corpus =
    * docs with doc_id % 3 <> 0, incoming batch = even doc_ids, key = the
    * document text. The one-sided-error contract is what the oracle
    * replays: `exact_dup` (the ground truth, an EXISTS both engines
    * compute) and `no_false_neg` — a Bloom miss on a true duplicate is
    * impossible by construction, so the column is identically TRUE and a
    * filter bug flips the hash. The Bloom flag itself is fpp-probabilistic
    * and stays out of the hash (BloomSpec pins its FP band and layout
    * independence). Plan: corpus pays one 20-byte-per-row shuffle into
    * bucket-sharded bit arrays; the probe is a bucket cogroup — no
    * corpus-vs-batch key shuffle, the at-scale point of the operator.
    */
  val dedupBloomNovelty = NamedQuery(
    "dedup_bloom_novelty",
    """SELECT i.doc_id AS id,
      |  EXISTS (SELECT 1 FROM documents c
      |          WHERE c.doc_id % 3 <> 0 AND md5(c.text) = md5(i.text)) AS exact_dup,
      |  TRUE AS no_false_neg
      |FROM documents i WHERE i.doc_id % 2 = 0
      |ORDER BY id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val incoming = docs.filter(col("doc_id") % 2 === 0)
    // expectedItems is a sizing UPPER bound (overestimating only lowers
    // the realized fpp) — a literal here keeps query build action-free
    val flags = graft.operators.BloomDedup.noveltyAgainst(
      corpus, col("text"), incoming, col("doc_id"), col("text"),
      expectedItems = 100000L, fpp = 0.001, buckets = 32)
    val truth = incoming.alias("i")
      .join(corpus.select(md5(col("text")).as("_k")).distinct().alias("c"),
        md5(col("i.text")) === col("c._k"), "left")
      .select(col("i.doc_id").as("id"), col("c._k").isNotNull.as("exact_dup"))
    truth.join(flags, Seq("id"), "left")
      .select(col("id"), col("exact_dup"),
        // one-sided error law: seen covers every true duplicate
        (col("probably_seen") || !col("exact_dup")).as("no_false_neg"))
      .orderBy("id")
  }

  /** DIRECTED containment over the winnow sketches (round 7 — Broder's
    * containment coefficient): c(a→b) = |S_a ∩ S_b| / |S_a|, both
    * directions of each intersecting pair. The excerpt/quote detector
    * symmetric near-dup misses: a contained document scores high a→b
    * while b→a (and jaccard) stay low. Shares the winnow CTE with
    * text_winnow/dedup_winnow so the sketch algorithm cannot drift; the
    * containment itself is exact integers + one double division —
    * full replay.
    */
  val dedupContainment = NamedQuery(
    "dedup_containment",
    s"""WITH $winnowSelCte,
       |dsel AS (SELECT DISTINCT id, mn FROM sel),
       |sz AS (SELECT id, count(*) AS s FROM dsel GROUP BY id),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
       |  FROM dsel a JOIN dsel b ON a.mn = b.mn AND a.id <> b.id
       |  GROUP BY 1, 2),
       |c AS (
       |  SELECT p.id_a, p.id_b, p.shared,
       |    CAST(p.shared AS DOUBLE) / sz.s AS containment
       |  FROM pairs p JOIN sz ON sz.id = p.id_a)
       |SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared,
       |  ${sqlDround("containment", 6)} AS containment_r
       |FROM c WHERE shared >= 5 AND containment >= 0.5
       |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val sketch = graft.operators.TextAnalysis.winnow(
      Tables.documents(s, d), col("doc_id"), col("text"), n = 3, window = 4)
    graft.operators.TextAnalysis.winnowContainment(
        sketch, minShared = 5, minContainment = 0.5)
      .select(col("id_a"), col("id_b"), col("shared"),
        dround(col("containment"), 6).as("containment_r"))
      .orderBy("id_a", "id_b")
  }

  val all: Seq[NamedQuery] = Seq(
    dedupExact, dedupNgramJaccard, dedupClusters, dedupMinhashSig,
    dedupMinhashLsh, dedupSimhash, dedupEmbCosine, dedupWinnow, dedupLines,
    dedupSemantic, q9StreamDedup, dedupSubstring, dedupBloomNovelty,
    textBoilerplate, dedupContainment)
}
