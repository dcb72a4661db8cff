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

  /** Sentence regex shared with the SQL oracle: a run up to (and
    * including) terminal punctuation, or the unterminated tail. Uses
    * `\z` (absolute end), which Java regex and RE2 agree on — `$` does
    * NOT (Java lets it float before a final newline).
    */
  val SentencePattern: String = "[^.!?]*[.!?]+|[^.!?]+\\z"

  /** Sentence-aware chunking: segment on terminal punctuation, then pack
    * WHOLE sentences greedily into `maxTokens` budgets — the boundary
    * contract retrieval actually wants (a window chunker slices
    * mid-sentence). Greedy contract: scan sentences in order; start a
    * new chunk when adding the next sentence would exceed the budget and
    * the current chunk is non-empty (an oversized single sentence gets
    * its own chunk). Sentence token counts use the shared tokenizer.
    *
    * Scale: segmentation and token counts are per-row Column algebra;
    * the greedy fold is ONE deterministic pass over each document's own
    * bounded sentence list (a scalar UDF — the sequential carry has no
    * declarative form, and per-doc state is the textbook case for one).
    * Replayable: DuckDB reproduces the identical packing with a
    * recursive CTE over the same regex and counts (see the gate query).
    *
    * @return (id, chunk_id, n_sentences, n_tokens, chunk_text) — chunk
    *         text joins its sentences with single spaces, trimmed.
    */
  def chunkBySentences(docs: DataFrame, id: Column, text: Column,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive (got $maxTokens)")
    val greedy = udf { (sents: Seq[String], ntoks: Seq[Int]) =>
      val out = Seq.newBuilder[(Int, Int, Int, String)]
      var chunk = 0; var cum = 0; var nSent = 0
      val sb = new StringBuilder
      def flush(): Unit = if (nSent > 0) {
        out += ((chunk, nSent, cum, sb.toString))
        chunk += 1; cum = 0; nSent = 0; sb.clear()
      }
      sents.indices.foreach { i =>
        if (nSent > 0 && cum + ntoks(i) > maxTokens) flush()
        if (nSent > 0) sb.append(' ')
        sb.append(sents(i)); cum += ntoks(i); nSent += 1
      }
      flush()
      out.result()
    }
    val sentsCol = filter(
      transform(regexp_extract_all(text, lit(SentencePattern), lit(0)), s => trim(s)),
      s => s =!= "")
    docs.filter(text.isNotNull)
      .select(id.cast("long").as("id"), sentsCol.as("_sents"))
      .filter(size(col("_sents")) > 0)
      .withColumn("_ntoks",
        transform(col("_sents"), s => org.apache.spark.sql.functions.size(Dedup.tokens(s))))
      .select(col("id"), explode(greedy(col("_sents"), col("_ntoks"))).as("_c"))
      .select(col("id"), col("_c._1").as("chunk_id"),
        col("_c._2").as("n_sentences"), col("_c._3").as("n_tokens"),
        col("_c._4").as("chunk_text"))
  }
}
