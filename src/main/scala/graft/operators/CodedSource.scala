package graft.operators

import org.apache.spark.sql.{Column, Row}
import graft.model.IndexKind.Metric

/** A code source for the DiskANN coded graph walk
  * ([[graft.engine.VamanaServe]] CodedAccess — Subramanya et al. 2019):
  * how artifact vectors become the narrow per-hop payload, how wide a
  * payload row is (bucket sizing of the coded serving table), and how a
  * fetched payload scores against a query. Three implementations:
  *
  *   - [[PqCodes]]: plain product quantization — identity query map,
  *     codes straight from the corpus vectors, per-query ADC table
  *     (reference shard/vectorstore/product.go semantics);
  *   - [[OpqCodes]]: OPQ (Ge et al. 2013, operators/Opq.scala) — the
  *     learned orthogonal rotation is applied to the vector before
  *     encoding AND to the query before the ADC table is built, so the
  *     walk ranks in the rotated space where the codebooks were trained.
  *     Orthogonality preserves both L2 and dot, so the metric routing is
  *     unchanged;
  *   - [[RbqCodes]]: RaBitQ (Gao & Long SIGMOD 2024,
  *     operators/RaBitQ.scala) — 1 sign bit per dimension + 3 scalars,
  *     scored by the paper's unbiased estimator. At D dims the payload is
  *     D/64 longs + 24 bytes: narrower than PQ m=16 already at 64-d and
  *     ~m·4·64/D-fold narrower as D grows (1536-d: 192 B vs 6 KB raw) —
  *     the narrowest per-hop fetch the family offers.
  *
  * The walk itself never inspects payloads — it fetches, extracts, and
  * scores through this interface — so the 100 TB scan shape (bucket-pruned
  * point reads of a `_gid`-sorted layout) does not depend on which source
  * produced the codes.
  */
sealed trait CodedSource {
  /** Payload-kind tag, part of the coded serving table's PATH and catalog
    * name: the three sources write incompatible `_codes` schemas
    * (int-array vs struct) and even same-schema PQ/OPQ codes rank under
    * different query maps, so a table materialized by one source must
    * never be served to another — the tag keys the layout per kind the
    * way IvfRbq's meta guard versions its artifact.
    */
  def tag: String

  /** Per-row `_codes` payload bytes for a `dim`-d artifact (bucket-count
    * sizing of the coded serving table).
    */
  def payloadBytes(dim: Int): Long

  /** Encode an artifact vector column into the `_codes` payload (one
    * pass over the artifact when the coded serving table materializes).
    */
  def encodeExpr(vec: Column): Column

  /** Extract the fetched `_codes` value at `idx` of a fetched row into
    * the in-memory payload [[scorer]] consumes.
    */
  def payloadOf(row: Row, idx: Int): AnyRef

  /** Distance of a payload to `qvec`, built once per (query, walk). The
    * caller has already cosine-normalized `qvec` when the metric is
    * Cosine (scale-invariance in q makes that free; the stored side
    * declares normalized input — the family's PQ operating note).
    * Metric.Dot scores by the source's inner-product form (negated, the
    * Dot distance sign); everything else by its squared-L2 form.
    */
  def scorer(metric: Metric, qvec: Array[Float]): AnyRef => Double
}

/** Shared ADC scoring for the PQ-shaped sources: map the query into the
  * code space, build the per-query table, fold codes through it.
  */
sealed trait PqAdcSource extends CodedSource {
  /** Codebooks the per-query ADC tables are built from. */
  def pq: PQModel

  /** Map a query into the space the codes quantize (identity for plain
    * PQ; the learned rotation for OPQ — one d×d mat-vec on the driver,
    * once per query).
    */
  def mapQuery(q: Array[Float]): Array[Float]

  def payloadBytes(dim: Int): Long = 4L * pq.m
  def payloadOf(row: Row, idx: Int): AnyRef = row.getSeq[Int](idx).toArray
  def scorer(metric: Metric, qvec: Array[Float]): AnyRef => Double = {
    val q2 = mapQuery(qvec)
    val table =
      if (metric == Metric.Dot) ProductQuantizer.adcDotTable(q2, pq)
      else ProductQuantizer.adcTable(q2, pq)
    p => {
      val cs = p.asInstanceOf[Array[Int]]
      var acc = 0.0
      var i = 0
      while (i < cs.length) { acc += table(i)(cs(i)); i += 1 }
      acc
    }
  }
}

object CodedSource {
  /** Every implementation's [[CodedSource.tag]] — the serving-table
    * cleanup (VamanaVectorIndex.release) derives its drop-suffix list
    * from this, so adding a source without extending it would leak
    * tables; VamanaServeSpec's tag law ties the two together.
    */
  val tags: Seq[String] = Seq("pq", "opq", "rbq")
}

final case class PqCodes(pq: PQModel) extends PqAdcSource {
  def tag: String = "pq"
  def mapQuery(q: Array[Float]): Array[Float] = q
  def encodeExpr(vec: Column): Column = ProductQuantizer.encodeUdf(pq)(vec)
}

final case class OpqCodes(model: Opq.OpqModel) extends PqAdcSource {
  def tag: String = "opq"
  def pq: PQModel = model.pq
  def mapQuery(q: Array[Float]): Array[Float] = model.rotate(q)
  def encodeExpr(vec: Column): Column =
    ProductQuantizer.encodeUdf(model.pq)(Opq.rotateUdf(model.rotation)(vec))
}

/** RaBitQ codes as the walk's payload: `_codes` is the encode struct
  * `(bits array<long>, norm, dotq, dotc)`; hops rank by the unbiased
  * squared-L2 estimate (Metric.Dot by the reconstructed inner product,
  * negated — [[RaBitQ.dotScorer]]). The estimator needs no per-query
  * table — just the centered/normalized/rotated query fold, built once
  * per walk like the ADC tables.
  */
final case class RbqCodes(model: RaBitQ.RbqModel) extends CodedSource {
  def tag: String = "rbq"
  def payloadBytes(dim: Int): Long = 8L * ((dim + 63) / 64) + 24L
  def encodeExpr(vec: Column): Column = RaBitQ.encodeUdf(model)(vec)
  def payloadOf(row: Row, idx: Int): AnyRef = {
    val s = row.getStruct(idx)
    (s.getSeq[Long](0), s.getDouble(1), s.getDouble(2), s.getDouble(3))
  }
  def scorer(metric: Metric, qvec: Array[Float]): AnyRef => Double =
    if (metric == Metric.Dot) {
      val sc = RaBitQ.dotScorer(model, qvec.toSeq)
      p => {
        val (bits, norm, dotq, dotc) =
          p.asInstanceOf[(Seq[Long], Double, Double, Double)]
        sc(bits, norm, dotq, dotc)
      }
    } else {
      val sc = RaBitQ.l2Scorer(model, qvec.toSeq)
      p => {
        val (bits, norm, dotq, _) =
          p.asInstanceOf[(Seq[Long], Double, Double, Double)]
        sc(bits, norm, dotq)
      }
    }
}
