package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval/RAG preparation step
  * that turns long documents into bounded, overlapping token windows an
  * embedding model can consume (the chunk layout used by every
  * retrieval-augmented pipeline since REALM/RAG, Lewis et al. 2020, and
  * the context-window packing mirror of [[Packing]]'s training side).
  *
  * Contract: tokens are [[Dedup.tokens]] (the repo-wide TokenPattern);
  * chunk `i` covers tokens `[i·stride, i·stride + size)`; the number of
  * chunks for an `n`-token document is `1` when `n <= size`, else
  * `ceil((n - size) / stride) + 1` — i.e. the LAST chunk is the first
  * window reaching the end of the document, so every token is covered and
  * no fully-redundant trailing window is emitted. Documents with zero
  * tokens emit nothing. Chunk identity is `(doc id, chunk index)` — a
  * pure row property, reproducible under any partition layout and by any
  * engine with the same tokenizer (which is what lets DuckDB replay the
  * full chunk set, text included).
  *
  * Scale: one narrow per-row pass — tokenize, compute the chunk count
  * with INTEGER arithmetic (no double rounding at the ceil boundary),
  * explode a `sequence` of chunk indices, slice. No shuffle, no state,
  * no window; output size is `O(n_tokens / stride)` per document, and
  * the fan-out composes with any downstream embedding or ANN stage.
  */
object Chunking {

  /** Chunk `docs` into overlapping token windows.
    *
    * @param size   tokens per chunk (> 0)
    * @param stride tokens between consecutive chunk starts (0 < stride <= size
    *               keeps coverage gap-free; stride == size is disjoint)
    * @return (id, chunk_id, tok_start, n_tokens, chunk_text)
    */
  def chunk(docs: DataFrame, id: Column, text: Column,
      size: Int, stride: Int): DataFrame = {
    require(size > 0, s"size must be positive (got $size)")
    require(stride > 0 && stride <= size,
      s"stride must be in (0, size] (got stride=$stride, size=$size) — " +
        "a stride beyond size would leave uncovered token gaps")
    val toks = Dedup.tokens(text)
    docs
      .filter(text.isNotNull)
      .select(id.cast("long").as("id"), toks.as("_toks"))
      .withColumn("_n", org.apache.spark.sql.functions.size(col("_toks")))
      .filter(col("_n") > 0)
      // integer ceil: nChunks = 1 when n <= size, else (n - size + stride - 1) div stride + 1
      .withColumn("_nc",
        when(col("_n") <= size, lit(1))
          .otherwise(expr(s"(_n - $size + ${stride - 1}) div $stride + 1")))
      .select(col("id"), col("_toks"), col("_n"),
        explode(sequence(lit(0), col("_nc").cast("int") - 1)).as("chunk_id"))
      .select(
        col("id"),
        col("chunk_id"),
        (col("chunk_id") * stride).cast("long").as("tok_start"),
        least(lit(size), col("_n") - col("chunk_id") * stride)
          .cast("long").as("n_tokens"),
        array_join(slice(col("_toks"), col("chunk_id") * stride + 1, lit(size)), " ")
          .as("chunk_text"))
  }
}
