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
    "would", "should", "could", "ought", "cannot",
    // bleve's list also carries contraction forms ("don't", "i'm", …) —
    // unreachable here BY CONSTRUCTION: the tokenizer splits on
    // apostrophes, so no token ever contains one (in Spark or in the
    // DuckDB oracle, which replays the same regex). Keeping them would
    // only bloat every isin list and generated SQL.
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

  /** Driver-side analysis of a query string (same tokenizer + stopwords).
    * Locale.ROOT, deliberately: the default-locale `toLowerCase` maps
    * 'I' → dotless 'ı' under tr-TR, which would miss indexed terms.
    *
    * DEPLOYMENT CONSTRAINT: Spark's `lower()` is locale-independent only
    * for pure-ASCII strings — `UTF8String.toLowerCase` routes any string
    * containing a non-ASCII byte through `String.toLowerCase()` under the
    * executor JVM's DEFAULT locale. A cluster whose executors run tr-TR/
    * az/lt locales will index 'İSTANBUL FAIR' as 'faır' while this method
    * (and the DuckDB oracle) produce 'fair'. Pin the JVM locale on every
    * executor (`spark.executor.extraJavaOptions=-Duser.language=en`), the
    * same class of environment pin as the UTC session-timezone
    * requirement in EventsStream.
    */
  def analyzeString(s: String): Seq[String] =
    TokenPattern.r.split(s.toLowerCase(java.util.Locale.ROOT))
      .filter(t => t.nonEmpty && !stopSet(t))
      .toSeq

  /** The stopword list as a SQL IN-list — ONE source for every generated
    * oracle (quality metrics, curation) so list and escaping can't drift.
    */
  val SqlStopList: String = StopWords.map(w => s"'${w.replace("'", "''")}'").mkString(",")

  /** The same analysis as a DuckDB SQL expression over `expr`, for oracles. */
  def sqlAnalyze(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^\\p{L}\\p{N}]+'), t -> t != '' AND t NOT IN ($SqlStopList))"
}
