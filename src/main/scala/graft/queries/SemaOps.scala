package graft.queries

import graft.engine.Search
import graft.model._

/** SURVEY §2 operator inventory, exercised through the real engine
  * (Json/AST → QueryCompiler → Search pipeline) with plain-SQL oracles.
  *
  * Every oracle re-attaches the metadata columns the engine always
  * returns (`_distance`, `_score`, `_hybridScore` — reference
  * httpapi/v2/handlers.go:475–483) and replicates the default ordering
  * (hybrid desc, then `_id`) plus offset/limit pagination.
  */
object SemaOps {

  /** Oracle boilerplate: the three metadata columns for non-ranked rows. */
  private val metaSql =
    "CAST(NULL AS REAL) AS _distance, CAST(NULL AS REAL) AS _score, CAST(0.0 AS REAL) AS _hybridScore"

  private def partsQuery(name: String, sql: String)(req: SearchRequest): NamedQuery =
    NamedQuery(name, sql)((s, d) => Search.search(TestCollections.parts(s, d), req))

  // ---- S4–S8: string operators -------------------------------------------

  val s4StringEquals = partsQuery(
    "s4_string_equals",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_brand, p_size
       |FROM (SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size FROM part
       |      WHERE lower(p_brand) = 'brand#3')
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("p_brand", string = Some(StringOpts("Brand#3", Op.Equals))),
      select = Seq("p_brand", "p_size"),
      limit = 100))

  val s5StringNotEquals = partsQuery(
    "s5_string_notequals",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_type
       |FROM part WHERE p_type IS NOT NULL AND p_type != 'ECONOMY'
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("p_type", string = Some(StringOpts("ECONOMY", Op.NotEquals))),
      select = Seq("p_type"),
      limit = 100))

  val s6StringStartsWith = partsQuery(
    "s6_string_startswith",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_name
       |FROM part WHERE lower(p_name) LIKE 'red%'
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("p_name", string = Some(StringOpts("red", Op.StartsWith))),
      select = Seq("p_name"),
      limit = 100))

  val s7StringCmp = partsQuery(
    "s7_string_cmp",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_name
       |FROM part WHERE lower(p_name) >= 'red' AND lower(p_name) < 'rf'
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("_and", and = Seq(
        Query("p_name", string = Some(StringOpts("red", Op.GreaterOrEq))),
        Query("p_name", string = Some(StringOpts("rf", Op.LessThan))))),
      select = Seq("p_name"),
      limit = 100))

  val s8StringInRange = partsQuery(
    "s8_string_inrange",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_name
       |FROM part WHERE lower(p_name) BETWEEN 'blue' AND 'bluf'
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("p_name", string = Some(StringOpts("blue", Op.InRange, "bluf"))),
      select = Seq("p_name"),
      limit = 100))

  // ---- S9–S10: integer / float operators ---------------------------------

  val s9IntegerInRange = partsQuery(
    "s9_integer_inrange",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_size
       |FROM (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size FROM part
       |      WHERE p_size BETWEEN 10 AND 15)
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("p_size", integer = Some(IntegerOpts(10, Op.InRange, 15))),
      select = Seq("p_size"),
      limit = 100))

  val s9IntegerCmp = partsQuery(
    "s9_integer_cmp",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_size
       |FROM (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size FROM part
       |      WHERE p_size <= 3)
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("p_size", integer = Some(IntegerOpts(3, Op.LessOrEq))),
      select = Seq("p_size"),
      limit = 100))

  val s10FloatInRange = partsQuery(
    "s10_float_inrange",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_retailprice
       |FROM part WHERE p_retailprice BETWEEN 905.0 AND 910.0
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("p_retailprice", float = Some(FloatOpts(905.0, Op.InRange, 910.0))),
      select = Seq("p_retailprice"),
      limit = 100))

  // ---- S11–S12: stringArray operators ------------------------------------

  val s11ArrayContainsAll = partsQuery(
    "s11_starray_containsall",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_name
       |FROM part
       |WHERE list_has_all(string_split(lower(p_name), ' '), ['small', 'ring'])
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("name_words",
        stringArray = Some(StringArrayOpts(Seq("Small", "Ring"), Op.ContainsAll))),
      select = Seq("p_name"),
      limit = 100))

  val s12ArrayContainsAny = partsQuery(
    "s12_starray_containsany",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_name
       |FROM part
       |WHERE list_has_any(string_split(lower(p_name), ' '), ['red', 'blue'])
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("name_words",
        stringArray = Some(StringArrayOpts(Seq("red", "blue"), Op.ContainsAny))),
      select = Seq("p_name"),
      limit = 100))

  // ---- Q4: _id lookup -----------------------------------------------------

  val q4IdLookup = partsQuery(
    "q4_id_lookup",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_name
       |FROM part WHERE CAST(p_partkey AS VARCHAR) IN ('5', '42', '100', '424242')
       |ORDER BY _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("_id",
        stringArray = Some(StringArrayOpts(Seq("5", "42", "100", "424242"), Op.ContainsAny))),
      select = Seq("p_name"),
      limit = 100))

  // ---- Q2/Q3: combinators over pure predicates + P3/P4 post-processing ----

  val q2AndFilters = partsQuery(
    "q2_and_filters",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_type, p_size, p_retailprice
       |FROM (SELECT p_partkey, p_type, CAST(p_size AS BIGINT) AS p_size, p_retailprice
       |      FROM part WHERE p_size BETWEEN 10 AND 15 AND p_type = 'SMALL')
       |ORDER BY p_retailprice DESC NULLS LAST, _id LIMIT 100""".stripMargin)(
    SearchRequest(
      query = Query("_and", and = Seq(
        Query("p_size", integer = Some(IntegerOpts(10, Op.InRange, 15))),
        Query("p_type", string = Some(StringOpts("SMALL", Op.Equals))))),
      select = Seq("p_type", "p_size", "p_retailprice"),
      sort = Seq(SortOption("p_retailprice", descending = true)),
      limit = 100))

  val q3OrFilters = partsQuery(
    "q3_or_filters",
    s"""SELECT CAST(p_partkey AS VARCHAR) AS _id, $metaSql, p_brand, p_size
       |FROM (SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size FROM part
       |      WHERE lower(p_brand) = 'brand#1' OR p_size > 45)
       |ORDER BY p_size DESC NULLS LAST, _id LIMIT 20 OFFSET 5""".stripMargin)(
    SearchRequest(
      query = Query("_or", or = Seq(
        Query("p_brand", string = Some(StringOpts("Brand#1", Op.Equals))),
        Query("p_size", integer = Some(IntegerOpts(45, Op.GreaterThan))))),
      select = Seq("p_brand", "p_size"),
      sort = Seq(SortOption("p_size", descending = true)),
      offset = 5,
      limit = 20))

  val all: Seq[NamedQuery] = Seq(
    s4StringEquals, s5StringNotEquals, s6StringStartsWith, s7StringCmp,
    s8StringInRange, s9IntegerInRange, s9IntegerCmp, s10FloatInRange,
    s11ArrayContainsAll, s12ArrayContainsAny, q4IdLookup, q2AndFilters,
    q3OrFilters)
}
