package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Search
import graft.functions.TextAnalyzer
import graft.model._

/** Q2/Q3 hybrid merge queries: weighted combinations of ranked vector and
  * text searches, including the docs' "kitchen sink" shape (reference
  * docs/content/docs/search/kitchen.md): a pre-filtered weighted vector
  * search OR'd with a post-filtered weighted text search, then
  * select/sort/limit.
  *
  * Weights are chosen binary-exact (0.5, 2.0, 0.25, 0.75) so float32
  * hybrid scores agree bit-for-bit across engines before rounding.
  */
object HybridQueries {

  /** Shared oracle CTEs: the joined collection, vector ranking (euclidean²
    * or cosine), and tf-idf text ranking — mirrors of the engine's leaves.
    */
  private def prelude(terms: Seq[String]): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
       |coll AS (
       |  SELECT CAST(doc_id AS VARCHAR) AS _id, text, lang, source, n_chars,
       |         label, embedding
       |  FROM documents JOIN embeddings ON doc_id = vec_id),
       |tok AS (
       |  SELECT _id, ${TextAnalyzer.sqlAnalyze("text")} AS terms FROM coll),
       |posts AS (
       |  SELECT _id, len(terms) AS doclen, unnest(terms) AS term FROM tok),
       |grouped AS (
       |  SELECT _id, doclen, term, count(*) AS freq
       |  FROM posts GROUP BY _id, doclen, term),
       |stats AS (SELECT count(*) AS numdocs FROM tok),
       |dfreq AS (
       |  SELECT term, count(*) AS df FROM grouped
       |  WHERE term IN ($termList) GROUP BY term),
       |scored AS (
       |  SELECT g._id, count(*) AS nterms,
       |    sum((CAST(g.freq AS DOUBLE) / g.doclen)
       |        * log10(CAST(numdocs AS DOUBLE) / (d.df + 1))) AS score
       |  FROM grouped g JOIN dfreq d USING (term) CROSS JOIN stats
       |  GROUP BY g._id)""".stripMargin
  }

  val q2HybridAnd = NamedQuery(
    "q2_hybrid_and",
    s"""${prelude(Seq("spark", "filter", "merge"))},
       |vrank AS (
       |  SELECT _id, 1.0 - list_sum(list_transform(range(1, 65), t -> CAST(embedding[t] AS DOUBLE) * CAST(q.v[t] AS DOUBLE))) AS dist
       |  FROM coll CROSS JOIN q ORDER BY dist ASC, _id ASC LIMIT 75),
       |vh AS (
       |  SELECT _id, CAST(dist AS REAL) AS dist32,
       |         CAST(-0.5 * CAST(dist AS REAL) AS REAL) AS vhybrid
       |  FROM vrank),
       |trank AS (
       |  SELECT _id, CAST(score AS REAL) AS score32 FROM scored
       |  ORDER BY score DESC, _id ASC LIMIT 75),
       |th AS (
       |  SELECT _id, score32, CAST(2.0 * score32 AS REAL) AS thybrid FROM trank),
       |merged AS (
       |  SELECT v._id, v.dist32, t.score32,
       |         CAST(v.vhybrid + t.thybrid AS REAL) AS hybrid
       |  FROM vh v JOIN th t USING (_id))
       |SELECT _id,
       |  CAST(round(CAST(dist32 AS DECIMAL(28,6)), 4) AS DOUBLE) AS dist_r,
       |  CAST(round(CAST(score32 AS DECIMAL(28,6)), 4) AS DOUBLE) AS score_r,
       |  CAST(round(CAST(hybrid AS DECIMAL(28,6)), 4) AS DOUBLE) AS hybrid_r
       |FROM merged ORDER BY hybrid_r DESC, _id""".stripMargin) { (s, d) =>
    val req = SearchRequest(
      Query("_and", and = Seq(
        Query("embedding", vectorFlat = Some(VectorFlatOpts(
          TestCollections.queryVector(s, d, 0), Op.Near, 75, weight = Some(0.5f)))),
        Query("text", text = Some(TextOpts("spark filter merge", Op.ContainsAny, 75,
          weight = Some(2.0f)))))),
      limit = 100)
    Search.search(TestCollections.docs(s, d), req)
      .select(
        col("_id"),
        dround(col("_distance"), 4).as("dist_r"),
        dround(col("_score"), 4).as("score_r"),
        dround(col("_hybridScore"), 4).as("hybrid_r"))
      .orderBy(col("hybrid_r").desc, col("_id"))
  }

  val q3HybridOr = NamedQuery(
    "q3_hybrid_or",
    s"""${prelude(Seq("spark", "filter", "merge"))},
       |vrank AS (
       |  SELECT _id, 1.0 - list_sum(list_transform(range(1, 65), t -> CAST(embedding[t] AS DOUBLE) * CAST(q.v[t] AS DOUBLE))) AS dist
       |  FROM coll CROSS JOIN q ORDER BY dist ASC, _id ASC LIMIT 20),
       |vh AS (
       |  SELECT _id, CAST(dist AS REAL) AS dist32,
       |         CAST(-0.5 * CAST(dist AS REAL) AS REAL) AS vhybrid
       |  FROM vrank),
       |trank AS (
       |  SELECT _id, CAST(score AS REAL) AS score32 FROM scored
       |  ORDER BY score DESC, _id ASC LIMIT 20),
       |th AS (
       |  SELECT _id, score32, CAST(2.0 * score32 AS REAL) AS thybrid FROM trank),
       |merged AS (
       |  SELECT coalesce(v._id, t._id) AS _id, v.dist32, t.score32,
       |         CAST(coalesce(v.vhybrid, 0) + coalesce(t.thybrid, 0) AS REAL) AS hybrid
       |  FROM vh v FULL OUTER JOIN th t ON v._id = t._id)
       |SELECT _id,
       |  CAST(round(CAST(dist32 AS DECIMAL(28,6)), 4) AS DOUBLE) AS dist_r,
       |  CAST(round(CAST(score32 AS DECIMAL(28,6)), 4) AS DOUBLE) AS score_r,
       |  CAST(round(CAST(hybrid AS DECIMAL(28,6)), 4) AS DOUBLE) AS hybrid_r
       |FROM merged ORDER BY hybrid_r DESC, _id""".stripMargin) { (s, d) =>
    val req = SearchRequest(
      Query("_or", or = Seq(
        Query("embedding", vectorFlat = Some(VectorFlatOpts(
          TestCollections.queryVector(s, d, 0), Op.Near, 20, weight = Some(0.5f)))),
        Query("text", text = Some(TextOpts("spark filter merge", Op.ContainsAny, 20,
          weight = Some(2.0f)))))),
      limit = 100)
    Search.search(TestCollections.docs(s, d), req)
      .select(
        col("_id"),
        dround(col("_distance"), 4).as("dist_r"),
        dround(col("_score"), 4).as("score_r"),
        dround(col("_hybridScore"), 4).as("hybrid_r"))
      .orderBy(col("hybrid_r").desc, col("_id"))
  }

  /** Batch-amortized HYBRID serving (round 12): four complete
    * `_or`(vamana + text) requests through Search.searchMany in ONE call.
    * searchMany decomposes each request's tree: the four approx vamana
    * leaves advance as a single hop-fused walk wave, the four IDENTICAL
    * text leaves compile once (value-keyed precompiled map), and each
    * request's `_or` merge then runs on the precompiled leaf results —
    * the full hybrid workload amortizes end-to-end instead of falling
    * back to the sequential pipeline. Per-request results are identical
    * to independent Search.search calls (SearchManySpec hybrid law), so
    * the oracle is the q3_hybrid_or replay windowed per query: exact
    * per-qi vector top-10 (at beam 75 each walk pool contains its exact
    * top-10 — the s1_near_vamana_many argument) full-outer-joined with
    * the shared tf-idf text top-20, float32 weighted score-sum.
    */
  val q3HybridMany = NamedQuery(
    "q3_hybrid_many",
    s"""${prelude(Seq("spark", "filter", "merge"))},
       |qm AS (SELECT vec_id AS qi, embedding AS v FROM embeddings WHERE vec_id <= 3),
       |vrank AS (
       |  SELECT qm.qi, CAST(doc_id AS VARCHAR) AS _id,
       |    CAST(power(list_distance(embedding, qm.v), 2) AS REAL) AS dist32,
       |    row_number() OVER (PARTITION BY qm.qi
       |      ORDER BY CAST(power(list_distance(embedding, qm.v), 2) AS REAL) ASC,
       |               CAST(doc_id AS VARCHAR) ASC) AS rn
       |  FROM documents JOIN embeddings ON doc_id = vec_id CROSS JOIN qm),
       |vh AS (
       |  SELECT qi, _id, dist32,
       |         CAST(CAST(-0.5 AS REAL) * dist32 AS REAL) AS vhybrid
       |  FROM vrank WHERE rn <= 10),
       |trank AS (
       |  SELECT _id, CAST(score AS REAL) AS score32 FROM scored
       |  ORDER BY score DESC, _id ASC LIMIT 20),
       |th AS (
       |  SELECT qs.qi, t._id, t.score32,
       |         CAST(CAST(2.0 AS REAL) * t.score32 AS REAL) AS thybrid
       |  FROM (SELECT DISTINCT qi FROM qm) qs CROSS JOIN trank t),
       |merged AS (
       |  SELECT coalesce(v.qi, t.qi) AS qi, coalesce(v._id, t._id) AS _id,
       |         v.dist32, t.score32,
       |         CAST(coalesce(v.vhybrid, 0) + coalesce(t.thybrid, 0) AS REAL) AS hybrid
       |  FROM vh v FULL OUTER JOIN th t ON v.qi = t.qi AND v._id = t._id)
       |SELECT CAST(qi AS BIGINT) AS qi, _id,
       |  CAST(round(CAST(dist32 AS DECIMAL(28,6)), 4) AS DOUBLE) AS dist_r,
       |  CAST(round(CAST(score32 AS DECIMAL(28,6)), 4) AS DOUBLE) AS score_r,
       |  CAST(round(CAST(hybrid AS DECIMAL(28,6)), 4) AS DOUBLE) AS hybrid_r
       |FROM merged ORDER BY qi, hybrid_r DESC, _id""".stripMargin) { (s, d) =>
    val coll = TestCollections.docsVamana(s, d)
    val reqs = (0L to 3L).map(i => SearchRequest(
      Query("_or", or = Seq(
        Query("vec_l2", vectorVamana = Some(VectorVamanaOpts(
          TestCollections.queryVector(s, d, i), Op.Near, searchSize = 75,
          limit = 10, weight = Some(0.5f), approx = true))),
        Query("text", text = Some(TextOpts("spark filter merge",
          Op.ContainsAny, 20, weight = Some(2.0f)))))),
      limit = 100))
    Search.searchMany(coll, reqs).zipWithIndex.map { case (df, qi) =>
      df.select(lit(qi.toLong).as("qi"), col("_id"),
        dround(col("_distance"), 4).as("dist_r"),
        dround(col("_score"), 4).as("score_r"),
        dround(col("_hybridScore"), 4).as("hybrid_r"))
    }.reduce(_ unionAll _)
      .orderBy(col("qi"), col("hybrid_r").desc, col("_id"))
  }

  /** Kitchen sink: pre-filtered weighted vamana OR post-filtered weighted
    * text, select + data-column sort + limit 5.
    */
  val kitchenSink = NamedQuery(
    "q5_kitchen_sink",
    s"""${prelude(Seq("spark", "window"))},
       |vrank AS (
       |  SELECT _id, power(list_distance(embedding, q.v), 2) AS dist
       |  FROM coll CROSS JOIN q
       |  WHERE label BETWEEN 0 AND 4 AND n_chars > 100
       |  ORDER BY dist ASC, _id ASC LIMIT 10),
       |vh AS (
       |  SELECT _id, CAST(dist AS REAL) AS dist32,
       |         CAST(-0.25 * CAST(dist AS REAL) AS REAL) AS vhybrid
       |  FROM vrank),
       |trank AS (
       |  SELECT _id, CAST(score AS REAL) AS score32 FROM scored
       |  WHERE nterms = 2
       |  ORDER BY score DESC, _id ASC LIMIT 10),
       |th AS (
       |  SELECT t._id, t.score32, CAST(0.75 * t.score32 AS REAL) AS thybrid
       |  FROM trank t JOIN coll c ON t._id = c._id
       |  WHERE c.n_chars > 200),
       |merged AS (
       |  SELECT coalesce(v._id, t._id) AS _id, v.dist32, t.score32,
       |         CAST(coalesce(v.vhybrid, 0) + coalesce(t.thybrid, 0) AS REAL) AS hybrid
       |  FROM vh v FULL OUTER JOIN th t ON v._id = t._id),
       |paged AS (
       |  SELECT m._id, m.dist32, m.score32, m.hybrid, c.n_chars, c.lang
       |  FROM merged m JOIN coll c ON m._id = c._id
       |  ORDER BY c.n_chars ASC, m._id ASC LIMIT 5)
       |SELECT _id,
       |  CAST(round(CAST(dist32 AS DECIMAL(28,6)), 4) AS DOUBLE) AS dist_r,
       |  CAST(round(CAST(score32 AS DECIMAL(28,6)), 4) AS DOUBLE) AS score_r,
       |  CAST(round(CAST(hybrid AS DECIMAL(28,6)), 4) AS DOUBLE) AS hybrid_r,
       |  n_chars, lang
       |FROM paged ORDER BY n_chars, _id""".stripMargin) { (s, d) =>
    val req = SearchRequest(
      Query("_or", or = Seq(
        Query("vec_l2", vectorVamana = Some(VectorVamanaOpts(
          TestCollections.queryVector(s, d, 0), Op.Near, searchSize = 75, limit = 10,
          filter = Some(Query("_and", and = Seq(
            Query("label", integer = Some(IntegerOpts(0, Op.InRange, 4))),
            Query("n_chars", integer = Some(IntegerOpts(100, Op.GreaterThan)))))),
          weight = Some(0.25f)))),
        Query("_and", and = Seq(
          Query("text", text = Some(TextOpts("spark window", Op.ContainsAll, 10,
            weight = Some(0.75f)))),
          Query("n_chars", integer = Some(IntegerOpts(200, Op.GreaterThan))))))),
      select = Seq("n_chars", "lang"),
      sort = Seq(SortOption("n_chars")),
      limit = 5)
    Search.search(TestCollections.docs(s, d), req)
      .select(
        col("_id"),
        dround(col("_distance"), 4).as("dist_r"),
        dround(col("_score"), 4).as("score_r"),
        dround(col("_hybridScore"), 4).as("hybrid_r"),
        col("n_chars"), col("lang"))
      .orderBy(col("n_chars"), col("_id"))
  }

  /** Reciprocal Rank Fusion of two heterogeneous retrievers — BM25
    * top-20 for the 3-term text query fused with the exact cosine top-20
    * for the vec_id-0 vector (testdata aligns doc_id and vec_id) by
    * Σ 1/(60 + rank). Integer ranks make the fusion arithmetic
    * bit-exact in any engine: DuckDB rebuilds BOTH lists (the full BM25
    * pipeline + the exact kNN with identical tiebreaks) and replays the
    * join-and-sum — no scores cross the engine boundary, only ranks.
    * The weighted score-sum hybrid (q2/q3) needs calibrated scales; RRF
    * is the calibration-free alternative the IR literature defaults to.
    */
  val hybridRrfFuse = NamedQuery(
    "hybrid_rrf_fuse",
    s"""WITH tok AS (
       |  SELECT doc_id AS id, ${TextAnalyzer.sqlAnalyze("text")} AS terms
       |  FROM documents WHERE text IS NOT NULL),
       |grouped AS (
       |  SELECT id, len(terms) AS dl, term, count(*) AS tf
       |  FROM (SELECT id, terms, unnest(terms) AS term FROM tok)
       |  GROUP BY id, dl, term),
       |stats AS (
       |  SELECT count(*) AS n, CAST(sum(len(terms)) AS DOUBLE) / count(*) AS avgdl FROM tok),
       |dfreq AS (
       |  SELECT term, count(*) AS df FROM grouped
       |  WHERE term IN ('spark', 'filter', 'merge') GROUP BY term),
       |bmranked AS (
       |  SELECT g.id,
       |    CAST(sum(
       |      ln(1 + (n - df + 0.5) / (df + 0.5)) * (CAST(tf AS DOUBLE) * 2.2)
       |        / (CAST(tf AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
       |    ) AS REAL) AS score32
       |  FROM grouped g JOIN dfreq USING (term) CROSS JOIN stats
       |  GROUP BY g.id ORDER BY score32 DESC, g.id ASC LIMIT 20),
       |bm AS (
       |  SELECT id, row_number() OVER (ORDER BY score32 DESC, id) AS rank FROM bmranked),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |vd AS (
       |  SELECT e.vec_id AS id,
       |    row_number() OVER (ORDER BY
       |      1.0 - list_sum(list_transform(range(1, 65), t -> CAST(e.embedding[t] AS DOUBLE) * CAST(q.qv[t] AS DOUBLE))),
       |      e.vec_id) AS rank
       |  FROM embeddings e CROSS JOIN q),
       |vv AS (SELECT id, rank FROM vd WHERE rank <= 20),
       |fused AS (
       |  SELECT coalesce(bm.id, vv.id) AS id,
       |    (coalesce(1.0 / (60.0 + bm.rank), 0.0) + coalesce(1.0 / (60.0 + vv.rank), 0.0)) AS s,
       |    ((CASE WHEN bm.rank IS NOT NULL THEN 1 ELSE 0 END)
       |      + (CASE WHEN vv.rank IS NOT NULL THEN 1 ELSE 0 END)) AS n_lists
       |  FROM bm FULL OUTER JOIN vv ON bm.id = vv.id)
       |SELECT id, ${sqlDround("s", 6)} AS rrf_r, CAST(n_lists AS INT) AS n_lists
       |FROM fused ORDER BY rrf_r DESC, id""".stripMargin) { (s, d) =>
    import graft.operators.{Curation, Similarity, TextAnalysis}
    import graft.model.IndexKind.Metric
    val docs = graft.Tables.documents(s, d)
    val emb = graft.Tables.embeddings(s, d)
    // BM25 emits (score32-ordered) rows; ranks assigned driver-side over
    // the bounded top-20 (a global row_number window would trip PlanLint
    // for no reason at 20 rows)
    val bmRows = TextAnalysis.bm25(docs, col("doc_id"), col("text"),
        queryText = "the spark AND filter, merge!", k = 20)
      .select(col("id")).collect().map(_.getLong(0))
    import s.implicits._
    val bmList = bmRows.toSeq.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
      .toDF("id", "rank")
    val vecList = Similarity.knnJoin(
        emb.filter(col("vec_id") === 0), col("vec_id"), col("embedding"),
        emb, col("vec_id"), col("embedding"), k = 20, metric = Metric.Cosine)
      .select(col("corpus_id").as("id"), col("rank").cast("long").as("rank"))
    Curation.rrfFuse(Seq(bmList, vecList), k = 60)
      .select(col("id"), dround(col("rrf_score"), 6).as("rrf_r"), col("n_lists"))
      .orderBy(col("rrf_r").desc, col("id"))
  }

  val all: Seq[NamedQuery] = Seq(q2HybridAnd, q3HybridOr, q3HybridMany,
    kitchenSink, hybridRrfFuse)
}
