package graft.operators

import org.apache.spark.sql.Column

/** A code source for the DiskANN coded graph walk
  * ([[graft.engine.VamanaServe]] CodedAccess — Subramanya et al. 2019):
  * how artifact vectors become the narrow per-hop codes, and how a query
  * maps into the space those codes quantize. Two implementations:
  *
  *   - [[PqCodes]]: plain product quantization — identity query map,
  *     codes straight from the corpus vectors (reference
  *     shard/vectorstore/product.go semantics);
  *   - [[OpqCodes]]: OPQ (Ge et al. 2013, operators/Opq.scala) — the
  *     learned orthogonal rotation is applied to the vector before
  *     encoding AND to the query before the ADC table is built, so the
  *     walk ranks in the rotated space where the codebooks were trained.
  *     Orthogonality preserves both L2 and dot, so the metric routing is
  *     unchanged.
  *
  * Either way the per-hop fetch reads the same m-byte `_codes` payload —
  * the 100 TB scan shape does not depend on which source produced it.
  */
sealed trait CodedSource {
  /** Codebooks the per-query ADC tables are built from. */
  def pq: PQModel

  /** Map a query into the space the codes quantize (identity for plain
    * PQ; the learned rotation for OPQ — one d×d mat-vec on the driver,
    * once per query).
    */
  def mapQuery(q: Array[Float]): Array[Float]

  /** Encode an artifact vector column into the `_codes` payload (one
    * pass over the artifact when the coded serving table materializes).
    */
  def encodeExpr(vec: Column): Column
}

final case class PqCodes(pq: PQModel) extends CodedSource {
  def mapQuery(q: Array[Float]): Array[Float] = q
  def encodeExpr(vec: Column): Column = ProductQuantizer.encodeUdf(pq)(vec)
}

final case class OpqCodes(model: Opq.OpqModel) extends CodedSource {
  def pq: PQModel = model.pq
  def mapQuery(q: Array[Float]): Array[Float] = model.rotate(q)
  def encodeExpr(vec: Column): Column =
    ProductQuantizer.encodeUdf(model.pq)(Opq.rotateUdf(model.rotation)(vec))
}
