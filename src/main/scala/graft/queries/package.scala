package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {

  /** A driver-checkable query: a Spark build function plus (optionally) the
    * equivalent ANSI SQL that DuckDB runs over the same parquet tables.
    * Column names must match exactly between the two (the driver sorts
    * columns by name and hashes values).
    */
  final case class NamedQuery(
      name: String,
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object NamedQuery {
    def apply(name: String, sql: String)(build: (SparkSession, String) => DataFrame): NamedQuery =
      NamedQuery(name, build, Some(sql))
    def unoracled(name: String)(build: (SparkSession, String) => DataFrame): NamedQuery =
      NamedQuery(name, build, None)
  }

  /** DuckDB-side raw tokenizer over a `text` column — the SQL mirror of
    * Dedup.tokens/TextAnalyzer.TokenPattern, ONE source for every
    * generated oracle (the Scala side centralizes TokenPattern for the
    * same reason: a drifted copy would silently split tokenization
    * between query families).
    */
  val sqlRawToks: String =
    """list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'), t -> t != '')"""

  /** Shared oracle CTE: winnowing sketch selection (n=3 token grams,
    * window=4, rightmost-min ties via argmin-max) ending in a `sel` view
    * of `(id, pos, mn)` — used verbatim by text_winnow and dedup_winnow so
    * the two oracles can never drift apart on the algorithm.
    */
  val winnowSelCte: String =
    s"""tok AS (
      |  SELECT doc_id AS id, $sqlRawToks AS raw
      |  FROM documents),
      |gr AS (
      |  SELECT id, CASE WHEN len(raw) >= 3
      |    THEN list_transform(range(1, len(raw) - 1),
      |         i -> raw[i] || ' ' || raw[i+1] || ' ' || raw[i+2])
      |    ELSE [] END AS g
      |  FROM tok),
      |h AS (
      |  SELECT id, list_transform(g, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS hs
      |  FROM gr WHERE len(g) > 0),
      |wins AS (
      |  SELECT id, hs, CAST(i AS BIGINT) AS ws,
      |    CASE WHEN len(hs) <= 4 THEN CAST(len(hs) AS BIGINT) ELSE CAST(i AS BIGINT) + 3 END AS we
      |  FROM h CROSS JOIN unnest(range(1, CASE WHEN len(hs) <= 4 THEN 2 ELSE len(hs) - 2 END)) AS t(i)),
      |sel AS (
      |  SELECT id,
      |    list_max(list_filter(range(ws, we + 1), j -> hs[j] = list_min(hs[ws:we]))) AS pos,
      |    list_min(hs[ws:we]) AS mn
      |  FROM wins)""".stripMargin

  // ---- cross-engine determinism conventions -------------------------------
  //
  // Floating-point aggregation order differs between Spark and DuckDB, so
  // any SUM/AVG that feeds a hash compare goes through DECIMAL (exact,
  // order-independent) and is rounded half-up (both engines) before being
  // cast back to double. Scalar per-row doubles are rounded the same way.

  private val Dec = DecimalType(28, 6)

  /** Order-independent sum: decimal accumulate, round, back to double. */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(Dec)), scale).cast("double")

  /** Order-independent mean via decimal sum / count. NOTE: Spark divides
    * in DECIMAL while DuckDB's division is performed in DOUBLE — a group
    * mean sitting exactly on a half-ulp rounding boundary at the target
    * scale could theoretically diverge; all 54 driver queries hash-match,
    * so the domains are kept as-is rather than risk changing both sides.
    */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(Dec)) / count(lit(1)), scale).cast("double")

  /** Deterministic per-row rounding of a double expression. */
  def dround(c: Column, scale: Int = 4): Column =
    round(c.cast(Dec), scale).cast("double")

  /** ORDER-FREE row-set digest: the exact DECIMAL sums of the two
    * 60-bit halves of each row's md5, joined as "lo-hi". Commutative and
    * constant-state per group — the digest an actual 100 TB shard writer
    * could compute (vs `sort_array(collect_list(...))`, whose agg buffer
    * holds the whole group). Any changed/added/dropped row moves both
    * halves; 10^12 rows × 2^60 stays far inside DECIMAL(38,0).
    */
  def orderFreeDigest(row: Column): Column = {
    val h = md5(row)
    def half(lo: Int): Column =
      sum(conv(substring(h, lo, 15), 16, 10).cast(DecimalType(38, 0)))
    concat_ws("-", half(1), half(17))
  }

  // DuckDB-side equivalents (string snippets for oracle SQL)
  def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(round(sum(CAST(($expr) AS DECIMAL(28,6))), $scale) AS DOUBLE)"
  def sqlDavg(expr: String, scale: Int = 4): String =
    s"CAST(round(sum(CAST(($expr) AS DECIMAL(28,6))) / count(*), $scale) AS DOUBLE)"
  def sqlDround(expr: String, scale: Int = 4): String =
    s"CAST(round(CAST(($expr) AS DECIMAL(28,6)), $scale) AS DOUBLE)"
}
