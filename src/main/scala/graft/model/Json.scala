package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON wire format for SearchRequest, matching the reference's HTTP body
  * shape byte-for-byte on field names (`_and`, `_or`, `vectorFlat`, ...).
  * Hand-rolled (no reflection) so error messages and defaults are explicit.
  */
object Json {

  def parseSearchRequest(json: String): SearchRequest =
    searchRequest(JsonMethods.parse(json))

  /** msgpack wire body → the same AST → the same parser (the reference
    * accepts both encodings on every endpoint, handlers.go:97–100).
    */
  def parseSearchRequestMsgPack(bytes: Array[Byte]): SearchRequest =
    searchRequest(MsgPack.decode(bytes))

  def parseQuery(json: String): Query = query(JsonMethods.parse(json))

  def searchRequest(j: JValue): SearchRequest = SearchRequest(
    query = query(j \ "query"),
    select = strSeq(j \ "select"),
    sort = (j \ "sort") match {
      case JArray(xs) => xs.map(s => SortOption(str(s \ "property"), bool(s \ "descending")))
      case JNothing | JNull => Nil
      case other => throw new IllegalArgumentException(s"expected sort array, got $other")
    },
    offset = int(j \ "offset", 0),
    limit = int(j \ "limit", 10))

  def query(j: JValue): Query = j match {
    case JNothing | JNull => throw new IllegalArgumentException("query is required")
    case _ => Query(
      property = str(j \ "property"),
      vectorFlat = opt(j \ "vectorFlat")(v => VectorFlatOpts(
        floatSeq(v \ "vector"), str(v \ "operator"), int(v \ "limit", 10),
        opt(v \ "filter")(query), optFloat(v \ "weight"),
        approx = bool(v \ "approx"))),
      vectorVamana = opt(j \ "vectorVamana")(v => VectorVamanaOpts(
        floatSeq(v \ "vector"), str(v \ "operator"),
        int(v \ "searchSize", 75), int(v \ "limit", 10),
        opt(v \ "filter")(query), optFloat(v \ "weight"),
        approx = bool(v \ "approx"))),
      text = opt(j \ "text")(v => TextOpts(
        str(v \ "value"), str(v \ "operator"), int(v \ "limit", 10),
        opt(v \ "filter")(query), optFloat(v \ "weight"))),
      string = opt(j \ "string")(v => StringOpts(
        str(v \ "value"), str(v \ "operator"), str(v \ "endValue", ""))),
      integer = opt(j \ "integer")(v => IntegerOpts(
        long(v \ "value"), str(v \ "operator"), long(v \ "endValue", 0L))),
      float = opt(j \ "float")(v => FloatOpts(
        double(v \ "value"), str(v \ "operator"), double(v \ "endValue", 0.0))),
      stringArray = opt(j \ "stringArray")(v => StringArrayOpts(
        strSeq(v \ "value"), str(v \ "operator"))),
      and = subqueries(j \ "_and", "_and"),
      or = subqueries(j \ "_or", "_or"))
  }

  // a non-array _and/_or (an object is the easy client mistake) must be a
  // type error here, not the misleading downstream "must have at least one
  // subquery" that silently-Nil parsing produced
  private def subqueries(j: JValue, field: String): Seq[graft.model.Query] = j match {
    case JArray(xs) => xs.map(query)
    case JNothing | JNull => Nil
    case other => throw new IllegalArgumentException(
      s"expected $field array, got $other")
  }

  // ---- primitives ---------------------------------------------------------

  private def opt[T](j: JValue)(f: JValue => T): Option[T] = j match {
    case JNothing | JNull => None
    case v => Some(f(v))
  }
  private def optFloat(j: JValue): Option[Float] = opt(j)(v => double(v).toFloat)
  private def str(j: JValue, default: String = null): String = j match {
    case JString(s) => s
    case JNothing | JNull if default != null => default
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }
  private def bool(j: JValue): Boolean = j match {
    case JBool(b) => b
    case JNothing | JNull => false
    case other => throw new IllegalArgumentException(s"expected boolean, got $other")
  }
  // out-of-range integers must error, not wrap (BigInt.toInt / Long.toInt
  // keep the low bits: {"limit": 2^32+10} would silently become 10)
  private def int(j: JValue, default: Int): Int = j match {
    case JInt(n) =>
      require(n.isValidInt, s"integer out of range: $n"); n.toInt
    case JLong(n) =>
      require(n >= Int.MinValue && n <= Int.MaxValue, s"integer out of range: $n"); n.toInt
    // msgpack/JS encoders commonly send whole numbers as float64 — long()
    // accepts them, so int() must too or the same wire value is accepted
    // in one field and rejected in the next
    case JDouble(d) if d.isWhole =>
      require(d >= Int.MinValue && d <= Int.MaxValue, s"integer out of range: $d"); d.toInt
    case JNothing | JNull => default
    case other => throw new IllegalArgumentException(s"expected int, got $other")
  }
  private def long(j: JValue, default: java.lang.Long = null): Long = j match {
    case JInt(n) =>
      require(n.isValidLong, s"integer out of range: $n"); n.toLong
    case JLong(n) => n
    // same no-wrap rule int() enforces: a whole float64 past ±2^63 must
    // error, not saturate to Long.MaxValue. Long.MaxValue.toDouble rounds
    // UP to 2^63 exactly, so the upper bound is strict.
    case JDouble(d) if d.isWhole =>
      require(d >= Long.MinValue.toDouble && d < Long.MaxValue.toDouble,
        s"integer out of range: $d"); d.toLong
    case JNothing | JNull if default != null => default
    case other => throw new IllegalArgumentException(s"expected integer, got $other")
  }
  private def double(j: JValue, default: java.lang.Double = null): Double = j match {
    case JDouble(d) => d
    case JInt(n) => n.toDouble
    case JLong(n) => n.toDouble
    case JDecimal(d) => d.toDouble
    case JNothing | JNull if default != null => default
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }
  private def strSeq(j: JValue): Seq[String] = j match {
    case JArray(xs) => xs.map(x => str(x))
    case JNothing | JNull => Nil
    case other => throw new IllegalArgumentException(s"expected string array, got $other")
  }
  private def floatSeq(j: JValue): Seq[Float] = j match {
    case JArray(xs) => xs.map {
      case JDouble(d) => d.toFloat
      case JInt(n) => n.toFloat
      case JLong(n) => n.toFloat
      case JDecimal(d) => d.toFloat
      case other => throw new IllegalArgumentException(s"expected number in vector, got $other")
    }
    case JNothing | JNull => Nil
    // a scalar/string "vector" must be a type error, not a silent Nil
    // that surfaces as the misleading "vector length must be ≥ 1, got 0"
    case other => throw new IllegalArgumentException(s"expected number array, got $other")
  }
}
