package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The "standard" text analyser: unicode word tokenization, lowercase,
  * English stopword removal — mirroring the reference's bleve standard
  * analyzer (reference shard/index/text/text.go:69–96, models/index.go:315–324).
  *
  * Tokenization here is letter/digit runs (`[\p{L}\p{N}]+`), a close,
  * deterministic approximation of UAX#29 word boundaries (divergence:
  * mid-word apostrophes split; the reference keeps "don't" whole). The
  * stopword list is the Snowball English list bleve uses.
  *
  * Everything is pure `Column` algebra — no UDFs — so the analyser stays
  * inside whole-stage codegen and the same regex/list can be replicated
  * verbatim in ANSI SQL for the correctness oracle.
  */
object TextAnalyzer {

  val TokenPattern = "[^\\p{L}\\p{N}]+"

  /** Snowball English stopwords (the list behind bleve's "stop_en"). */
  val StopWords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "your", "yours", "yourself", "yourselves",
    "he", "him", "his", "himself", "she", "her", "hers", "herself",
    "it", "its", "itself", "they", "them", "their", "theirs", "themselves",
    "what", "which", "who", "whom", "this", "that", "these", "those",
    "am", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "having", "do", "does", "did", "doing",
    "would", "should", "could", "ought",
    "i'm", "you're", "he's", "she's", "it's", "we're", "they're",
    "i've", "you've", "we've", "they've",
    "i'd", "you'd", "he'd", "she'd", "we'd", "they'd",
    "i'll", "you'll", "he'll", "she'll", "we'll", "they'll",
    "isn't", "aren't", "wasn't", "weren't", "hasn't", "haven't", "hadn't",
    "doesn't", "don't", "didn't", "won't", "wouldn't", "shan't", "shouldn't",
    "can't", "cannot", "couldn't", "mustn't", "let's", "that's", "who's",
    "what's", "here's", "there's", "when's", "where's", "why's", "how's",
    "a", "an", "the", "and", "but", "if", "or", "because", "as", "until",
    "while", "of", "at", "by", "for", "with", "about", "against", "between",
    "into", "through", "during", "before", "after", "above", "below",
    "to", "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when", "where",
    "why", "how", "all", "any", "both", "each", "few", "more", "most",
    "other", "some", "such", "no", "nor", "not", "only", "own", "same",
    "so", "than", "too", "very")

  private val stopSet: Set[String] = StopWords.toSet

  /** Analyse a text column → array<string> of terms (duplicates preserved,
    * order preserved — term frequency derives from this).
    */
  def analyze(c: Column): Column =
    filter(
      split(lower(c), TokenPattern),
      t => t =!= "" && !t.isin(StopWords: _*))

  /** Driver-side analysis of a query string (same tokenizer + stopwords). */
  def analyzeString(s: String): Seq[String] =
    TokenPattern.r.split(s.toLowerCase)
      .filter(t => t.nonEmpty && !stopSet(t))
      .toSeq

  /** The same analysis as a DuckDB SQL expression over `expr`, for oracles. */
  def sqlAnalyze(expr: String): String = {
    val stops = StopWords.map(w => s"'${w.replace("'", "''")}'").mkString(", ")
    s"list_filter(string_split_regex(lower($expr), '[^\\p{L}\\p{N}]+'), t -> t != '' AND t NOT IN ($stops))"
  }
}
