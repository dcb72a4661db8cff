package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalyzer
import Collection._

/** A built text index for one property: the postings DataFrame
  * `(_id, _doclen, _term, _freq)` persisted in memory plus the document
  * count — the Spark-native analogue of the reference's per-term roaring
  * sets + per-doc term-frequency maps maintained in bbolt buckets
  * (reference shard/index/text/text.go:151–258). Building is a batch job;
  * queries against a built index skip re-tokenizing the corpus.
  */
final case class TextIndex(postings: DataFrame, numDocs: Long)

object TextIndex {

  /** Build (and persist) the index for `prop` over a collection frame. */
  def build(df: DataFrame, prop: String): TextIndex = {
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
      .persist()
    TextIndex(postings, docs.count())
  }
}
