package graft.engine

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalyzer
import Collection._

/** A built text index for one property: the postings DataFrame
  * `(_id, _doclen, _term, _freq)` plus the document count — the
  * Spark-native analogue of the reference's per-term roaring sets +
  * per-doc term-frequency maps maintained in bbolt buckets (reference
  * shard/index/text/text.go:151–258). Building is a batch job; queries
  * against a built index skip re-tokenizing the corpus.
  *
  * Token-less documents (non-null text that analyzes to zero terms) keep
  * ONE null-`_term` row, so the postings frame itself carries the exact
  * non-null document count — queries filter on term equality first, which
  * a null term never matches, so these rows are inert at search time but
  * make per-write `numDocs` bookkeeping exact and batch-scale.
  *
  * `patchDepth`/`blocks` track the incremental-patch state: `postings`
  * at depth > 0 is a lazily COMPOSED view (base anti-join ∪ per-batch
  * checkpoints); `blocks` holds every materialized frame backing it, to
  * release on eviction or at the next compaction.
  */
final case class TextIndex(
    postings: DataFrame, numDocs: Long,
    patchDepth: Int = 0, blocks: Seq[DataFrame] = Nil) {

  /** Release every persisted/checkpointed block backing this index. */
  def release(): Unit = {
    org.apache.spark.sql.graft.Bridge.release(postings)
    blocks.foreach(org.apache.spark.sql.graft.Bridge.release)
  }
}

object TextIndex {

  /** Fold the composed patch chain into one materialized frame once it
    * reaches this depth — bounds per-query plan depth at ≤ CompactEvery
    * broadcast anti-joins while keeping the per-write cost batch-scale.
    */
  private val CompactEvery = 8

  /** Tokenize + aggregate the postings frame (shared by both builds). */
  private[engine] def compute(df: DataFrame, prop: String): (DataFrame, Long) = {
    val docs = df.filter(col(prop).isNotNull)
    // tokenize into a materialized column first — HOFs are interpreted, so
    // downstream per-element references must not inline the tokenizer
    val toks = docs
      .select(col(IdCol), TextAnalyzer.analyze(col(prop)).as("_terms"))
      .withColumn("_doclen", size(col("_terms")))
    // explode_outer: token-less docs keep one null-term row (see class doc)
    val postings = toks
      .select(col(IdCol), col("_doclen"), explode_outer(col("_terms")).as("_term"))
      .groupBy(IdCol, "_doclen", "_term")
      .agg(count(lit(1)).as("_freq"))
    (postings, docs.count())
  }

  /** Build (and persist in memory) the index for `prop`. */
  def build(df: DataFrame, prop: String): TextIndex = {
    val (postings, n) = compute(df, prop)
    val p = postings.persist()
    TextIndex(p, n, 0, Seq(p))
  }

  /** Incrementally patch a built index after a write (the reference
    * updates its inverted postings per point, text.go:151–258): drop the
    * affected ids' postings, re-analyze JUST those ids from the new
    * collection view, and splice. Per-write cost is batch-scale — only
    * the per-batch additions are materialized (the `_id IN (...)` slice
    * pushes into the view's scan); the splice itself stays a lazy
    * broadcast anti-join over the still-cached previous postings, folded
    * into one frame every [[CompactEvery]] patches. `numDocs` is
    * maintained by exact delta arithmetic (the null-term rows make every
    * non-null doc visible in the postings), not a corpus recount.
    */
  /** Returns the patched index plus the blocks it SUPERSEDED (non-empty
    * only when the patch chain compacted). The caller owns their release —
    * and must NOT release them immediately: a concurrent search that read
    * the pre-patch index from a cache may still be mid-job over those
    * checkpointed blocks, which have no lineage to recompute. Defer (the
    * facade retires them one write generation) or accept failed readers.
    */
  def patched(
      idx: TextIndex, newView: DataFrame, prop: String,
      ids: Seq[String]): (TextIndex, Seq[DataFrame]) = {
    if (ids.isEmpty) return (idx, Nil)
    val spark = newView.sparkSession
    import spark.implicits._
    val idsDf = ids.toDF(IdCol)
    val (addPost, addedN) = compute(newView.filter(col(IdCol).isin(ids: _*)), prop)
    val add = addPost.localCheckpoint() // batch-scale materialization
    try {
      // docs leaving the count: exact thanks to the null-term rows; scans
      // the in-memory postings with a broadcast semi-join, no re-tokenize
      val removedN = idx.postings
        .join(broadcast(idsDf), Seq(IdCol), "left_semi")
        .select(IdCol).distinct().count()
      val composed = idx.postings
        .join(broadcast(idsDf), Seq(IdCol), "left_anti")
        .unionByName(add)
      val numDocs = idx.numDocs - removedN + addedN
      if (idx.patchDepth + 1 >= CompactEvery) {
        val compacted = composed.localCheckpoint() // eager: folds the chain
        (TextIndex(compacted, numDocs, 0, Seq(compacted)),
          (idx.postings +: idx.blocks :+ add).distinct)
      } else {
        (TextIndex(composed, numDocs, idx.patchDepth + 1, idx.blocks :+ add), Nil)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        // the add checkpoint was never published anywhere — releasing it
        // immediately is safe and prevents a per-failure block leak
        org.apache.spark.sql.graft.Bridge.release(add)
        throw e
    }
  }

  /** Build the index materialized to parquet under `cacheDir` (first call
    * pays the tokenize + write; later calls — including fresh sessions or
    * after a `clearCache()` — pay a columnar read, never a corpus
    * re-tokenize). The returned postings are additionally memory-persisted
    * with the parquet file as their recompute source. Callers own the key:
    * `cacheDir` must be stable per (corpus, prop) and invalidated on write.
    */
  def buildDiskCached(df: DataFrame, prop: String, cacheDir: Path): TextIndex = {
    val spark = df.sparkSession
    // postings_t = the TERM-CLUSTERED layout below (own path, own marker —
    // the marker NAME is coupled to the path so a marker from any other
    // layout generation can never vouch for this one): caches built by
    // the older row-ordered writer (`postings` + `_done`) are rebuilt on
    // first touch, but NEVER overwritten in place — a concurrent JVM
    // still serving the old layout keeps its files; the old dir becomes
    // garbage once every reader has moved on
    val postingsPath = cacheDir.resolve("postings_t").toString
    val donePath = cacheDir.resolve("_done_postings_t")
    if (!Files.exists(donePath)) {
      val (postings, n) = compute(df, prop)
      Files.createDirectories(cacheDir)
      // cluster the on-disk postings BY TERM (range-partition, then sort
      // within files): a query's `_term isin (...)` read then prunes whole
      // files and row groups via parquet min/max stats instead of scanning
      // every posting of every document — the difference between an
      // inverted index and a table that merely contains one. In document
      // order (the natural compute() output) every row group spans the
      // whole vocabulary and term predicates prune nothing.
      postings
        .repartitionByRange(col("_term"), col(IdCol))
        .sortWithinPartitions("_term", IdCol)
        .write.mode("overwrite").parquet(postingsPath)
      Files.writeString(cacheDir.resolve("numdocs"), n.toString)
      Files.writeString(donePath, "")
    }
    val numDocs = Files.readString(cacheDir.resolve("numdocs")).trim.toLong
    val p = spark.read.parquet(postingsPath).persist()
    TextIndex(p, numDocs, 0, Seq(p))
  }
}
