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
  */
final case class TextIndex(postings: DataFrame, numDocs: Long)

object TextIndex {

  /** Tokenize + aggregate the postings frame (shared by both builds). */
  private[engine] def compute(df: DataFrame, prop: String): (DataFrame, Long) = {
    val docs = df.filter(col(prop).isNotNull)
    // tokenize into a materialized column first — HOFs are interpreted, so
    // downstream per-element references must not inline the tokenizer
    val toks = docs
      .select(col(IdCol), TextAnalyzer.analyze(col(prop)).as("_terms"))
      .withColumn("_doclen", size(col("_terms")))
    val postings = toks
      .select(col(IdCol), col("_doclen"), explode(col("_terms")).as("_term"))
      .groupBy(IdCol, "_doclen", "_term")
      .agg(count(lit(1)).as("_freq"))
    (postings, docs.count())
  }

  /** Build (and persist in memory) the index for `prop`. */
  def build(df: DataFrame, prop: String): TextIndex = {
    val (postings, n) = compute(df, prop)
    TextIndex(postings.persist(), n)
  }

  /** Incrementally patch a built index after a write (the reference
    * updates its inverted postings per point, text.go:151–258): drop the
    * affected ids' postings, re-analyze JUST those ids from the new
    * collection view, splice, and materialize. Cost scales with the batch,
    * never the corpus. The superseded postings cache is released once the
    * patched frame is materialized.
    */
  def patched(idx: TextIndex, newView: DataFrame, prop: String, ids: Seq[String]): TextIndex = {
    val spark = newView.sparkSession
    import spark.implicits._
    val idsDf = ids.toDF(IdCol)
    val (add, _) = compute(
      newView.join(broadcast(idsDf), Seq(IdCol), "left_semi"), prop)
    val postings = idx.postings
      .join(broadcast(idsDf), Seq(IdCol), "left_anti")
      .unionByName(add)
      .localCheckpoint() // eager: lineage-free before the old cache drops
    org.apache.spark.sql.graft.Bridge.release(idx.postings)
    // numDocs recomputed from the new view, NOT by postings delta
    // bookkeeping: a doc with non-null but token-less text has no
    // postings rows, and delta arithmetic would drift upward per write
    TextIndex(postings, newView.filter(col(prop).isNotNull).count())
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
    val postingsPath = cacheDir.resolve("postings").toString
    val donePath = cacheDir.resolve("_done")
    if (!Files.exists(donePath)) {
      val (postings, n) = compute(df, prop)
      Files.createDirectories(cacheDir)
      postings.write.mode("overwrite").parquet(postingsPath)
      Files.writeString(cacheDir.resolve("numdocs"), n.toString)
      Files.writeString(donePath, "")
    }
    val numDocs = Files.readString(cacheDir.resolve("numdocs")).trim.toLong
    TextIndex(spark.read.parquet(postingsPath).persist(), numDocs)
  }
}
