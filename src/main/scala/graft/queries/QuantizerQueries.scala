package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{BinaryQuantizer, ProductQuantizer}

/** §2.4 quantizer queries. Packed-bit hamming is fully oracle-checked:
  * DuckDB computes the same per-dimension mean thresholds and compares
  * bits elementwise — popcount over packed words must equal the
  * elementwise count. PQ/ADC has no closed-form oracle (k-means); it ships
  * as a rows-only query backed by recall specs.
  */
object QuantizerQueries {

  val bqHammingPacked = NamedQuery(
    "bq_hamming_packed",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |means AS (
      |  SELECT i, avg(CAST(embedding[i] AS DOUBLE)) AS m
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

  /** Rows-only (k-means has no cross-engine closed form): ADC top-10 for
    * the vec_id-7 query under an m=8, k=32 codebook.
    */
  val pqAdcTopk = NamedQuery.unoracled("pq_adc_topk") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = ProductQuantizer.fit(emb, col("embedding"), m = 8, k = 32, dim = 64)
    val codes = ProductQuantizer.encode(emb, col("vec_id"), col("embedding"), model)
    ProductQuantizer.adcSearch(codes, TestCollections.queryVector(s, d, 7), model, k = 10)
      .select(col("id"), dround(col("approx_distance"), 4).as("approx_r"))
  }

  /** Rows-only: the batch-built Vamana graph artifact (deterministic edge
    * lists; recall/connectivity invariants live in VamanaSpec). Uses a
    * small parameterization so the per-round bench stays bounded.
    */
  /** Neighbor lists are emitted as a CSV string, not array&lt;long&gt; —
    * the driver's pandas harness sorts result columns and cannot hash
    * numpy arrays (round-1 `unhashable type` failure).
    */
  val vamanaGraph = NamedQuery.unoracled("vamana_graph") { (s, d) =>
    graft.operators.VamanaBuild.build(
      Tables.embeddings(s, d), col("vec_id"), col("embedding"),
      graft.model.IndexKind.Metric.Euclidean,
      graft.operators.VamanaBuild.Params(
        degreeBound = 32, alpha = 1.2, iterations = 2, ringDegree = 4))
      .select(col("id"), size(col("neighbors")).as("degree"),
        concat_ws(",", transform(col("neighbors"), _.cast("string")))
          .as("neighbors_csv"))
  }

  val all: Seq[NamedQuery] = Seq(bqHammingPacked, pqAdcTopk, vamanaGraph)
}
