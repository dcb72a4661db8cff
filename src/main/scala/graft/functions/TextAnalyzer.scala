package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The "standard" text analyser: unicode word tokenization, lowercase,
  * English stopword removal — mirroring the reference's bleve standard
  * analyzer (reference shard/index/text/text.go:69–96, models/index.go:315–324).
  *
  * Tokenization extracts maximal alphanumeric runs that may be JOINED by
  * mid-word apostrophes (ASCII `'` and U+2019 `’`), matching UAX#29's
  * WB6/WB7 + WB11/WB12 treatment of Single_Quote/MidNumLet: "don't",
  * "O'Brien", "rock'n'roll", "3'5" stay whole; leading/trailing
  * apostrophes strip ("believin'" → "believin"). One corner divergence
  * remains, documented: a MIXED-class junction ("3'a") is kept whole
  * here but split by strict UAX#29 — expressing the class-adjacency
  * constraint needs lookaround, which DuckDB's RE2 (the oracle engine)
  * does not support, and the case is vanishingly rare in real text.
  *
  * The stopword list is the full Snowball English list bleve uses —
  * including the contraction forms ("don't", "i'm", …), which the
  * tokenizer above now actually produces.
  *
  * Everything is pure `Column` algebra — no UDFs — so the analyser stays
  * inside whole-stage codegen and the same regex/list can be replicated
  * verbatim in ANSI SQL for the correctness oracle.
  */
object TextAnalyzer {

  /** The repo-wide RAW-token split convention (Dedup.tokens and every
    * n-gram/packing/BPE operator): split on non-alphanumeric runs,
    * apostrophes included. Deliberately NOT the analyzer's word pattern —
    * raw tokens feed dedup shingles and token counts where bleve parity
    * is not the contract, and dozens of pinned goldens ride on it.
    */
  val TokenPattern = "[^\\p{L}\\p{N}]+"

  /** The analyzer's MATCH pattern (see class doc): alphanumeric runs
    * joined by mid-word apostrophes. Shared verbatim with the DuckDB
    * oracle (RE2-compatible: no lookaround).
    */
  val WordPattern = "[\\p{L}\\p{N}]+(?:['’][\\p{L}\\p{N}]+)*"

  /** Snowball English stopwords (the list behind bleve's "stop_en"),
    * contraction forms included — reachable now that the tokenizer keeps
    * mid-word apostrophes.
    */
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
      regexp_extract_all(lower(c), lit(WordPattern), lit(0)),
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
    WordPattern.r.findAllIn(s.toLowerCase(java.util.Locale.ROOT))
      .filter(t => t.nonEmpty && !stopSet(t))
      .toSeq

  /** The stopword list as a SQL IN-list — ONE source for every generated
    * oracle (quality metrics, curation) so list and escaping can't drift.
    */
  val SqlStopList: String = StopWords.map(w => s"'${w.replace("'", "''")}'").mkString(",")

  /** [[WordPattern]] as a DuckDB string literal (apostrophe doubled;
    * backslashes pass through verbatim in standard SQL strings).
    */
  val SqlWordPattern: String = WordPattern.replace("'", "''")

  /** The same analysis as a DuckDB SQL expression over `expr`, for oracles. */
  def sqlAnalyze(expr: String): String =
    s"list_filter(regexp_extract_all(lower($expr), '$SqlWordPattern'), t -> t != '' AND t NOT IN ($SqlStopList))"
}
