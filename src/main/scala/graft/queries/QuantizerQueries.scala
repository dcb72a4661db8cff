package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{BinaryQuantizer, ProductQuantizer}

/** §2.4 quantizer queries. Packed-bit hamming is fully oracle-checked:
  * DuckDB computes the same per-dimension mean thresholds and compares
  * bits elementwise — popcount over packed words must equal the
  * elementwise count. PQ/ADC under a learned codebook has no closed-form
  * replay (k-means), so pq_adc_topk pins a golden of the deterministic
  * fit (canonically-sorted training sample); pq_adc_fixed replays the
  * full ADC arithmetic under a closed-form codebook.
  */
object QuantizerQueries {

  val bqHammingPacked = NamedQuery(
    "bq_hamming_packed",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |means AS (
      |  SELECT i, CAST(round(sum(CAST(embedding[i] AS DECIMAL(28,6))) / count(embedding[i]), 9) AS DOUBLE) AS m
      |  FROM embeddings CROSS JOIN dims GROUP BY i),
      |th AS (SELECT list(m ORDER BY i) AS t FROM means),
      |q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
      |d AS (
      |  SELECT e.vec_id AS id,
      |    CAST(len(list_filter(range(1, 65),
      |      i -> (CAST(e.embedding[i] AS DOUBLE) > th.t[i])
      |           != (CAST(q.v[i] AS DOUBLE) > th.t[i]))) AS DOUBLE) AS distance
      |  FROM embeddings e CROSS JOIN q CROSS JOIN th)
      |SELECT id, distance FROM d
      |ORDER BY distance ASC, id ASC LIMIT 10""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val th = BinaryQuantizer.fit(emb, col("embedding"), 64)
    val encoded = BinaryQuantizer.encode(emb, col("embedding"), th)
    BinaryQuantizer.search(encoded, col("vec_id"),
      TestCollections.queryVector(s, d, 0), th, k = 10)
  }

  /** The production BQ operating mode, fully oracled: hamming over packed
    * sign bits picks the top-50 candidates, the true cosine re-ranks just
    * those (Quantizers.searchRescored) — DuckDB replays thresholds,
    * hamming, candidate cut, and re-rank.
    */
  val bqRescoredTopk = NamedQuery(
    "bq_rescored_topk",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |means AS (
      |  SELECT i, CAST(round(sum(CAST(embedding[i] AS DECIMAL(28,6))) / count(embedding[i]), 9) AS DOUBLE) AS m
      |  FROM embeddings CROSS JOIN dims GROUP BY i),
      |th AS (SELECT list(m ORDER BY i) AS t FROM means),
      |q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
      |hd AS (
      |  SELECT e.vec_id AS id, e.embedding,
      |    len(list_filter(range(1, 65),
      |      i -> (CAST(e.embedding[i] AS DOUBLE) > th.t[i])
      |           != (CAST(q.v[i] AS DOUBLE) > th.t[i]))) AS hdist
      |  FROM embeddings e CROSS JOIN q CROSS JOIN th),
      |cand AS (SELECT id, embedding FROM hd ORDER BY hdist ASC, id ASC LIMIT 50),
      |rr AS (
      |  SELECT c.id, 1.0 - list_sum(list_transform(range(1, 65), t -> CAST(c.embedding[t] AS DOUBLE) * CAST(q.v[t] AS DOUBLE))) AS dist
      |  FROM cand c CROSS JOIN q),
      |top AS (SELECT id, dist FROM rr ORDER BY dist ASC, id ASC LIMIT 10)
      |SELECT id, CAST(round(CAST(dist AS DECIMAL(28,6)), 4) AS DOUBLE) AS dist_r
      |FROM top ORDER BY dist_r, id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val th = BinaryQuantizer.fit(emb, col("embedding"), 64)
    val encoded = BinaryQuantizer.encode(
      emb.select(col("vec_id"), col("embedding")), col("embedding"), th)
    BinaryQuantizer.searchRescored(encoded, col("vec_id"), col("embedding"),
        TestCollections.queryVector(s, d, 0), th, k = 10, rescore = 50,
        graft.model.IndexKind.Metric.Cosine)
      .select(col("id"), dround(col("distance"), 4).as("dist_r"))
      .orderBy(col("dist_r"), col("id"))
  }

  /** ADC top-10 for the vec_id-7 query under a LEARNED m=8, k=32 codebook,
    * hash-compared against a PINNED GOLDEN (the vamana_graph convention):
    * DuckDB cannot replay seeded Lloyd's, but since round 5 the training
    * sample is canonically sorted (Similarity.vectorSample), so the
    * codebook — and this result — is a pure function of the corpus,
    * byte-stable across sessions, partition layouts, and machines
    * (QuantizerSpec's determinism test is the guarantee). Any drift in
    * sampling, kmeans++ init, Lloyd's arithmetic, encoding, or ADC lookup
    * flips the pinned rows. After an INTENTIONAL fit change, regenerate
    * via `python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/v
    * pq_adc_topk` and pin the printed spark-side rows.
    */
  val pqAdcTopk = NamedQuery(
    "pq_adc_topk",
    """SELECT CAST(id AS BIGINT) AS id, CAST(approx_r AS DOUBLE) AS approx_r
      |FROM (VALUES (7, 0.4338), (425, 0.8990), (445, 0.9210), (340, 0.9219),
      |  (17, 0.9690), (334, 0.9694), (423, 1.0042), (49, 1.0575),
      |  (9, 1.0648), (59, 1.0684)) t(id, approx_r)
      |ORDER BY approx_r, id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = ProductQuantizer.fit(emb, col("embedding"), m = 8, k = 32, dim = 64)
    val codes = ProductQuantizer.encode(emb, col("vec_id"), col("embedding"), model)
    ProductQuantizer.adcSearch(codes, TestCollections.queryVector(s, d, 7), model, k = 10)
      .select(col("id"), dround(col("approx_distance"), 4).as("approx_r"))
      .orderBy(col("approx_r"), col("id"))
  }

  /** The same encode + ADC arithmetic under a CLOSED-FORM codebook —
    * centroid j of subspace i is the i-th 16-float slice of the vec_id-j
    * embedding (m=4, k=8) — so DuckDB can replay the full pipeline:
    * per-(vector, subspace) argmin code, query→centroid distance table,
    * m table lookups. Gives the ADC path (reference
    * vectorstore/product.go:238–305) a real oracle row; the learned
    * codebook stays covered by recall specs + the rows-only query above.
    */
  val pqAdcFixed = NamedQuery(
    "pq_adc_fixed",
    """WITH subs AS (SELECT unnest(range(4)) AS i),
      |cents AS (SELECT unnest(range(8)) AS j),
      |cb AS (
      |  SELECT s.i, c.j, list_slice(e.embedding, s.i*16 + 1, s.i*16 + 16) AS cv
      |  FROM embeddings e, subs s, cents c
      |  WHERE e.vec_id = c.j),
      |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
      |dists AS (
      |  SELECT e.vec_id, cb.i, cb.j,
      |    list_sum(list_transform(range(1, 17),
      |      t -> (CAST(e.embedding[cb.i*16 + t] AS DOUBLE) - CAST(cb.cv[t] AS DOUBLE))
      |         * (CAST(e.embedding[cb.i*16 + t] AS DOUBLE) - CAST(cb.cv[t] AS DOUBLE)))) AS d2
      |  FROM embeddings e CROSS JOIN cb),
      |codes AS (
      |  SELECT vec_id, i, j AS code FROM (
      |    SELECT vec_id, i, j,
      |      row_number() OVER (PARTITION BY vec_id, i ORDER BY d2, j) AS rn
      |    FROM dists) WHERE rn = 1),
      |qtab AS (
      |  SELECT cb.i, cb.j,
      |    list_sum(list_transform(range(1, 17),
      |      t -> (CAST(q.qv[cb.i*16 + t] AS DOUBLE) - CAST(cb.cv[t] AS DOUBLE))
      |         * (CAST(q.qv[cb.i*16 + t] AS DOUBLE) - CAST(cb.cv[t] AS DOUBLE)))) AS d2
      |  FROM cb CROSS JOIN q),
      |scores AS (
      |  -- subspace-ASCENDING summation, matching the engine UDF's fold
      |  -- order exactly (a plain aggregate sum's order is unspecified,
      |  -- and double addition is not associative)
      |  SELECT c.vec_id AS id, list_sum(list(t.d2 ORDER BY t.i)) AS approx
      |  FROM codes c JOIN qtab t ON c.i = t.i AND c.code = t.j
      |  GROUP BY c.vec_id),
      |top AS (SELECT id, approx FROM scores ORDER BY approx, id LIMIT 10)
      |SELECT id, CAST(round(CAST(approx AS DECIMAL(28,6)), 4) AS DOUBLE) AS approx_r
      |FROM top ORDER BY approx_r, id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val base = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val cents = (0 until 4).map { i =>
      (0 until 8).map(j =>
        java.util.Arrays.copyOfRange(base(j), i * 16, (i + 1) * 16)).toArray
    }.toArray
    val model = graft.operators.PQModel(m = 4, k = 8, dim = 64, centroids = cents)
    val codes = ProductQuantizer.encode(emb, col("vec_id"), col("embedding"), model)
    ProductQuantizer.adcSearch(codes, TestCollections.queryVector(s, d, 7), model, k = 10)
      .select(col("id"), dround(col("approx_distance"), 4).as("approx_r"))
      .orderBy(col("approx_r"), col("id"))
  }

  /** The batch-built Vamana graph artifact, hash-compared against a PINNED
    * GOLDEN: since round 4 the build ranks by sorted id before
    * zipWithIndex, so the artifact is a pure function of the corpus —
    * byte-identical across partition layouts, sessions, and machines
    * (VamanaSpec's layout-independence test is the guarantee; recall and
    * connectivity invariants live there too). DuckDB cannot replay
    * NN-Descent, but it CAN verify the pinned digest of the sf0.01 build —
    * a strictly stronger check than the previous rows-only declaration:
    * any drift in ranking, pruning, distance arithmetic, or partitioning
    * sensitivity flips the hash. After an INTENTIONAL algorithm change,
    * regenerate by running `python3 tools/check_oracle.py
    * /root/testdata/sf0.01 /tmp/v vamana_graph` and pinning the printed
    * spark-side values. Small parameterization keeps the per-round bench
    * bounded.
    */
  val vamanaGraph = NamedQuery(
    "vamana_graph",
    """SELECT CAST(500 AS BIGINT) AS nodes, CAST(17806 AS BIGINT) AS edges,
      |'0845a21aea40ece0c72bc39c500a3d6f' AS graph_md5""".stripMargin) { (s, d) =>
    graft.operators.VamanaBuild.build(
      Tables.embeddings(s, d), col("vec_id"), col("embedding"),
      graft.model.IndexKind.Metric.Euclidean,
      // one NN-Descent round: the bench entry measures BUILD throughput;
      // the 1-round operating point reaches ~0.97 recall@10 (beam 75) on
      // this corpus vs ~0.99 at 2 rounds — both documented in RECALL.md,
      // and quality-sensitive callers (store artifacts, specs) keep ≥2
      graft.operators.VamanaBuild.Params(
        degreeBound = 32, alpha = 1.2, iterations = 1, ringDegree = 4))
      .select(col("id"),
        concat_ws(",", transform(col("neighbors"), _.cast("string")))
          .as("neighbors_csv"),
        size(col("neighbors")).as("degree"))
      // digest over the id-keyed adjacency strings, sorted AFTER collect so
      // the value is independent of row arrival order
      .agg(
        count(lit(1)).as("nodes"),
        sum(col("degree")).cast("long").as("edges"),
        md5(concat_ws("|",
          sort_array(collect_list(
            concat_ws(":", col("id"), col("neighbors_csv")))))).as("graph_md5"))
  }

  /** SQ8 top-10 for the vec_id-7 query under FIXED range [−4, 4] — the
    * fixed-range mode keeps every constant static, so DuckDB recomputes
    * each dimension's 0..255 code INLINE from the raw embedding and
    * replays the reconstruct-and-fold distance chain bit-for-bit (the
    * pq_adc_fixed convention: full pipeline, no golden). floor(x+0.5)
    * quantization, not round() — Spark rounds DECIMAL half-up, DuckDB
    * half-away, floor is floor everywhere. The trained min/max fit stays
    * covered by QuantizerSpec (exactness + layout laws).
    */
  val sq8Topk = {
    val dim = 64
    val lo = -4.0; val hi = 4.0
    val step = (hi - lo) / 255.0 // inject the SAME double literal both sides
    val chain = (1 to dim).map { i =>
      val xhat = s"($lo + least(greatest(floor((CAST(e.embedding[$i] AS DOUBLE) - $lo) * 255.0 / ${hi - lo} + 0.5), 0.0), 255.0) * $step)"
      s"(($xhat - CAST(q.qv[$i] AS DOUBLE)) * ($xhat - CAST(q.qv[$i] AS DOUBLE)))"
    }.mkString(" + ")
    NamedQuery(
      "sq8_topk",
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
         |d AS (
         |  SELECT e.vec_id AS id, ($chain) AS ad
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.embedding IS NOT NULL AND len(e.embedding) >= $dim
         |  ORDER BY ad, id LIMIT 10)
         |SELECT id, ${sqlDround("ad", 4)} AS approx_r
         |FROM d ORDER BY approx_r, id""".stripMargin) { (s, d) =>
      import graft.operators.ScalarQuantizer
      val emb = Tables.embeddings(s, d)
      val los = Array.fill(dim)(lo); val his = Array.fill(dim)(hi)
      val codes = ScalarQuantizer.encode(emb, col("vec_id"), col("embedding"), los, his)
      ScalarQuantizer.search(codes, TestCollections.queryVector(s, d, 7), los, his, k = 10)
        .select(col("id"), dround(col("approx_distance"), 4).as("approx_r"))
        .orderBy(col("approx_r"), col("id"))
    }
  }

  /** SQ8 DOT-metric candidate ranking (round 7 — the former "L2-biased
    * candidate pool for unnormalized dot" operating limitation, now a
    * served path): the corpus is deliberately UNNORMALIZED (each vector
    * scaled by 1 + vec_id % 5), candidates rank by the reconstructed
    * NEGATED INNER PRODUCT (ScalarQuantizer.approxDotDistance) — which
    * surfaces the long vectors an L2 ranking would bury. Fixed range
    * [−5, 5] keeps every constant static, so DuckDB recomputes codes and
    * the −q·x̂ fold INLINE (the sq8_topk convention: full replay, no
    * golden).
    */
  val sq8DotTopk = {
    val dim = 64
    val lo = -5.0; val hi = 5.0
    val step = (hi - lo) / 255.0
    val chain = (1 to dim).map { i =>
      // e is the ALREADY-scaled CTE — no re-scaling here
      val x = s"CAST(e.embedding[$i] AS DOUBLE)"
      val xhat = s"($lo + least(greatest(floor(($x - $lo) * 255.0 / ${hi - lo} + 0.5), 0.0), 255.0) * $step)"
      s"((-CAST(q.qv[$i] AS DOUBLE)) * $xhat)"
    }.mkString(" + ")
    NamedQuery(
      "sq8_dot_topk",
      s"""WITH s AS (
         |  SELECT vec_id, list_transform(range(1, $dim + 1),
         |    i -> CAST(CAST(embedding[i] AS DOUBLE) * (1.0 + CAST(vec_id % 5 AS DOUBLE)) AS REAL)) AS embedding
         |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) >= $dim),
         |q AS (SELECT embedding AS qv FROM s WHERE vec_id = 7),
         |d AS (
         |  SELECT e.vec_id AS id, ($chain) AS ad
         |  FROM s e CROSS JOIN q
         |  ORDER BY ad, id LIMIT 10)
         |SELECT id, ${sqlDround("ad", 4)} AS approx_r
         |FROM d ORDER BY approx_r, id""".stripMargin) { (s, d) =>
      import graft.operators.ScalarQuantizer
      val scaled = Tables.embeddings(s, d)
        .filter(col("embedding").isNotNull && size(col("embedding")) >= dim)
        .select(col("vec_id"), transform(col("embedding"),
          x => (x.cast("double") * (lit(1.0) + (col("vec_id") % 5).cast("double")))
            .cast("float")).as("embedding"))
      val los = Array.fill(dim)(lo); val his = Array.fill(dim)(hi)
      val codes = ScalarQuantizer.encode(scaled, col("vec_id"), col("embedding"), los, his)
      val qv = scaled.filter(col("vec_id") === 7)
        .select("embedding").head().getSeq[Float](0)
      codes
        .select(col("id"),
          ScalarQuantizer.approxDotDistance(col("codes"), qv, los, his).as("ad"))
        .orderBy(col("ad").asc, col("id").asc).limit(10)
        .select(col("id"), dround(col("ad"), 4).as("approx_r"))
        .orderBy(col("approx_r"), col("id"))
    }
  }

  /** Asymmetric 1-bit ADC (round 7): the query keeps full precision and
    * every stored bit scores against its side's learned mean level —
    * Σ (q_i − level_{bit_i,i})² over the same packed scan hamming uses,
    * the PQ asymmetric-distance idea at 1 bit. DuckDB recomputes
    * thresholds AND both level tables inline from the raw corpus and
    * replays the per-term CASE + index-order sum — full pipeline, no
    * golden. RECALL.md carries the operating-point rows (asym beats
    * symmetric hamming at the same scan width).
    */
  val bqAsymTopk = NamedQuery(
    "bq_asym_topk",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |means AS (
      |  SELECT i, CAST(round(sum(CAST(embedding[i] AS DECIMAL(28,6))) / count(embedding[i]), 9) AS DOUBLE) AS m
      |  FROM embeddings CROSS JOIN dims GROUP BY i),
      |th AS (SELECT list(m ORDER BY i) AS t FROM means),
      |lvl AS (
      |  SELECT d.i,
      |    coalesce(CAST(round(sum(CASE WHEN CAST(e.embedding[d.i] AS DOUBLE) <= th.t[d.i]
      |        THEN CAST(e.embedding[d.i] AS DECIMAL(28,6)) END) /
      |      count(CASE WHEN CAST(e.embedding[d.i] AS DOUBLE) <= th.t[d.i] THEN 1 END), 9) AS DOUBLE), th.t[d.i]) AS lo,
      |    coalesce(CAST(round(sum(CASE WHEN CAST(e.embedding[d.i] AS DOUBLE) > th.t[d.i]
      |        THEN CAST(e.embedding[d.i] AS DECIMAL(28,6)) END) /
      |      count(CASE WHEN CAST(e.embedding[d.i] AS DOUBLE) > th.t[d.i] THEN 1 END), 9) AS DOUBLE), th.t[d.i]) AS hi
      |  FROM embeddings e CROSS JOIN dims d CROSS JOIN th
      |  GROUP BY d.i, th.t),
      |lv AS (SELECT list(lo ORDER BY i) AS ll, list(hi ORDER BY i) AS lh FROM lvl),
      |q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 7),
      |d AS (
      |  SELECT e.vec_id AS id,
      |    list_sum(list_transform(range(1, 65), i ->
      |      CASE WHEN CAST(e.embedding[i] AS DOUBLE) > th.t[i]
      |        THEN (CAST(q.v[i] AS DOUBLE) - lv.lh[i]) * (CAST(q.v[i] AS DOUBLE) - lv.lh[i])
      |        ELSE (CAST(q.v[i] AS DOUBLE) - lv.ll[i]) * (CAST(q.v[i] AS DOUBLE) - lv.ll[i]) END)) AS ad
      |  FROM embeddings e CROSS JOIN q CROSS JOIN th CROSS JOIN lv
      |  ORDER BY ad, id LIMIT 10)
      |SELECT id, CAST(round(CAST(ad AS DECIMAL(28,6)), 4) AS DOUBLE) AS approx_r
      |FROM d ORDER BY approx_r, id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val th = BinaryQuantizer.fit(emb, col("embedding"), 64)
    val (lo, hi) = BinaryQuantizer.fitLevels(emb, col("embedding"), 64, th)
    val encoded = BinaryQuantizer.encode(emb, col("embedding"), th)
    BinaryQuantizer.searchAsymmetric(encoded, col("vec_id"),
        TestCollections.queryVector(s, d, 7), lo, hi, k = 10)
      .select(col("id"), dround(col("distance"), 4).as("approx_r"))
      .orderBy(col("approx_r"), col("id"))
  }

  /** OPQ ADC top-10 (Ge et al. 2013 parametric variant — see
    * operators/Opq.scala) for the vec_id-7 query under a LEARNED rotation
    * (PCA + eigenvalue allocation) and m=8, k=32 rotated-space codebook —
    * hash-compared against a PINNED GOLDEN, the pq_adc_topk convention:
    * DuckDB can replay neither the Jacobi eigensolve nor seeded Lloyd's,
    * but the whole model is a pure function of the corpus (both fit
    * stages train on the ONE canonical bounded sample, which at gate
    * scale IS the corpus; the PCA over it is exact fixed-point), so any
    * drift in the PCA fit, the allocation, the rotation arithmetic, the
    * codebook, encoding, or the ADC fold flips the pinned rows. After an
    * INTENTIONAL fit change, regenerate via `python3 tools/check_oracle.py
    * /root/testdata/sf0.01 /tmp/v opq_adc_topk` and pin the printed
    * spark-side rows.
    */
  val opqAdcTopk = NamedQuery(
    "opq_adc_topk",
    """SELECT CAST(id AS BIGINT) AS id, CAST(approx_r AS DOUBLE) AS approx_r
      |FROM (VALUES (7, 0.4263), (340, 0.8980), (332, 1.0078), (218, 1.0134),
      |  (445, 1.0274), (49, 1.0742), (221, 1.0805), (59, 1.0886),
      |  (297, 1.0908), (381, 1.1109)) t(id, approx_r)
      |ORDER BY approx_r, id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = graft.operators.Opq.fit(emb, col("embedding"), dim = 64, m = 8, k = 32)
    val codes = graft.operators.Opq.encode(emb, col("vec_id"), col("embedding"), model)
    graft.operators.Opq.adcSearch(codes, TestCollections.queryVector(s, d, 7), model, k = 10)
      .select(col("id"), dround(col("approx_distance"), 4).as("approx_r"))
      .orderBy(col("approx_r"), col("id"))
  }

  /** RaBitQ top-10 (Gao & Long, SIGMOD 2024 — operators/RaBitQ.scala)
    * under the IDENTITY rotation, fully oracled: the centroid is the
    * decimal-mean fit (the bq convention, replayable), and with P = I
    * every stage — unit residual, sign bits, the two stored scalars, the
    * query fold, the unbiased estimator — is plain per-element arithmetic
    * DuckDB recomputes inline. No golden; the RANDOM-rotation production
    * fit is pinned by rbq_rot_topk below and banded by RaBitQSpec.
    */
  val rbqTopk = NamedQuery(
    "rbq_topk",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |means AS (
      |  SELECT i, CAST(round(sum(CAST(embedding[i] AS DECIMAL(28,6))) / count(embedding[i]), 9) AS DOUBLE) AS m
      |  FROM embeddings CROSS JOIN dims GROUP BY i),
      |cv AS (SELECT list(m ORDER BY i) AS c FROM means),
      |q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 7),
      |qr AS (
      |  SELECT list_transform(range(1, 65), i -> CAST(q.v[i] AS DOUBLE) - cv.c[i]) AS rq
      |  FROM q CROSS JOIN cv),
      |qn AS (SELECT rq, sqrt(list_sum(list_transform(rq, x -> x * x))) AS qnorm FROM qr),
      |qu AS (SELECT list_transform(rq, x -> x / qnorm) AS qp, qnorm FROM qn),
      |enc AS (
      |  SELECT e.vec_id AS id,
      |    list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) - cv.c[i]) AS r
      |  FROM embeddings e CROSS JOIN cv),
      |en AS (SELECT id, r, sqrt(list_sum(list_transform(r, x -> x * x))) AS nrm FROM enc),
      |est AS (
      |  SELECT en.id,
      |    nrm * nrm + qu.qnorm * qu.qnorm - 2 * nrm * qu.qnorm *
      |      ((list_sum(list_transform(range(1, 65),
      |          i -> CASE WHEN en.r[i] > 0 THEN qu.qp[i] ELSE -qu.qp[i] END)) / sqrt(64.0))
      |       / (list_sum(list_transform(en.r, x -> abs(x / en.nrm))) / sqrt(64.0))) AS e
      |  FROM en CROSS JOIN qu),
      |top AS (SELECT id, e FROM est ORDER BY e ASC, id ASC LIMIT 10)
      |SELECT CAST(id AS BIGINT) AS id,
      |  CAST(round(CAST(e AS DECIMAL(28,6)), 4) AS DOUBLE) AS approx_r
      |FROM top ORDER BY approx_r, id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = graft.operators.RaBitQ.fitIdentity(emb, col("embedding"), 64)
    val codes = graft.operators.RaBitQ.encode(emb, col("vec_id"), col("embedding"), model)
    graft.operators.RaBitQ.search(codes, TestCollections.queryVector(s, d, 7), model, k = 10)
      .select(col("id"), dround(col("approx_distance"), 4).as("approx_r"))
      .orderBy(col("approx_r"), col("id"))
  }

  /** The DOT-metric RaBitQ route (the sq8_dot_topk convention): under the
    * identity rotation DuckDB replays the full inner-product
    * reconstruction — ⟨x,q⟩ ≈ ⟨c,q⟩ + ‖x−c‖·(‖q−c‖·cosEst + ⟨o,c⟩) with
    * the stored ⟨o,c⟩ scalar closing the centering algebra — so the
    * dotEstimateExpr path (QueryCompiler's Metric.Dot routing for
    * RbqVectorIndex) is inline-oracled with no golden. Negated, MIPS
    * ranks ascending like every distance.
    */
  val rbqDotTopk = NamedQuery(
    "rbq_dot_topk",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |means AS (
      |  SELECT i, CAST(round(sum(CAST(embedding[i] AS DECIMAL(28,6))) / count(embedding[i]), 9) AS DOUBLE) AS m
      |  FROM embeddings CROSS JOIN dims GROUP BY i),
      |cv AS (SELECT list(m ORDER BY i) AS c FROM means),
      |q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 7),
      |qr AS (
      |  SELECT list_transform(range(1, 65), i -> CAST(q.v[i] AS DOUBLE) - cv.c[i]) AS rq,
      |    list_sum(list_transform(range(1, 65), i -> cv.c[i] * CAST(q.v[i] AS DOUBLE))) AS cq
      |  FROM q CROSS JOIN cv),
      |qn AS (SELECT rq, cq, sqrt(list_sum(list_transform(rq, x -> x * x))) AS qnorm FROM qr),
      |qu AS (SELECT list_transform(rq, x -> x / qnorm) AS qp, qnorm, cq FROM qn),
      |enc AS (
      |  SELECT e.vec_id AS id,
      |    list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) - cv.c[i]) AS r
      |  FROM embeddings e CROSS JOIN cv),
      |en AS (SELECT id, r, sqrt(list_sum(list_transform(r, x -> x * x))) AS nrm FROM enc),
      |en2 AS (
      |  SELECT en.id, en.r, en.nrm,
      |    list_sum(list_transform(range(1, 65), i -> (en.r[i] / en.nrm) * cv.c[i])) AS dotc
      |  FROM en CROSS JOIN cv),
      |est AS (
      |  SELECT en2.id,
      |    -(qu.cq + nrm * (qu.qnorm *
      |      ((list_sum(list_transform(range(1, 65),
      |          i -> CASE WHEN en2.r[i] > 0 THEN qu.qp[i] ELSE -qu.qp[i] END)) / sqrt(64.0))
      |       / (list_sum(list_transform(en2.r, x -> abs(x / en2.nrm))) / sqrt(64.0)))
      |      + en2.dotc)) AS e
      |  FROM en2 CROSS JOIN qu),
      |top AS (SELECT id, e FROM est ORDER BY e ASC, id ASC LIMIT 10)
      |SELECT CAST(id AS BIGINT) AS id,
      |  CAST(round(CAST(e AS DECIMAL(28,6)), 4) AS DOUBLE) AS approx_r
      |FROM top ORDER BY approx_r, id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = graft.operators.RaBitQ.fitIdentity(emb, col("embedding"), 64)
    val codes = graft.operators.RaBitQ.encode(emb, col("vec_id"), col("embedding"), model)
    codes
      .select(col("id"),
        graft.operators.RaBitQ.dotEstimateExpr(
          col("bits"), col("norm"), col("dotq"), col("dotc"),
          TestCollections.queryVector(s, d, 7), model).as("approx_distance"))
      .orderBy(col("approx_distance").asc, col("id").asc)
      .limit(10)
      .select(col("id"), dround(col("approx_distance"), 4).as("approx_r"))
      .orderBy(col("approx_r"), col("id"))
  }

  /** The PRODUCTION RaBitQ fit — seeded RANDOM rotation (the paper's
    * distribution-free error bound needs it) — hash-compared against a
    * PINNED GOLDEN, the pq_adc_topk convention: DuckDB cannot replay the
    * seeded Gaussian Gram-Schmidt, but the model is a pure function of
    * (corpus, dim, seed) — java.util.Random's LCG and nextGaussian are
    * specified, the centroid is the exact decimal mean — so any drift in
    * the rotation build, the encode, the stored scalars, or the estimator
    * flips the pinned rows. After an INTENTIONAL fit change, regenerate
    * via `python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/v
    * rbq_rot_topk` and pin the printed spark-side rows.
    */
  val rbqRotTopk = NamedQuery(
    "rbq_rot_topk",
    """SELECT CAST(id AS BIGINT) AS id, CAST(approx_r AS DOUBLE) AS approx_r
      |FROM (VALUES (7, 0.0), (425, 0.9036), (209, 1.0145), (340, 1.0326),
      |  (313, 1.1408), (334, 1.1714), (103, 1.2619), (221, 1.2739),
      |  (435, 1.2970), (214, 1.3143)) t(id, approx_r)
      |ORDER BY approx_r, id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = graft.operators.RaBitQ.fit(emb, col("embedding"), 64)
    val codes = graft.operators.RaBitQ.encode(emb, col("vec_id"), col("embedding"), model)
    graft.operators.RaBitQ.search(codes, TestCollections.queryVector(s, d, 7), model, k = 10)
      .select(col("id"), dround(col("approx_distance"), 4).as("approx_r"))
      .orderBy(col("approx_r"), col("id"))
  }

  val all: Seq[NamedQuery] =
    Seq(bqHammingPacked, bqRescoredTopk, pqAdcTopk, pqAdcFixed, vamanaGraph,
      sq8Topk, sq8DotTopk, bqAsymTopk, opqAdcTopk, rbqTopk, rbqDotTopk,
      rbqRotTopk)
}
