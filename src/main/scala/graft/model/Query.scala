package graft.model

/** The query AST — a faithful Scala model of the reference's JSON query
  * language (reference models/search.go:54–65, 268–456). A query node names
  * a property and carries exactly one option block matching the property's
  * index type, or is an `_and`/`_or` combinator, or an `_id` lookup.
  */
final case class Query(
    property: String,
    vectorFlat: Option[VectorFlatOpts] = None,
    vectorVamana: Option[VectorVamanaOpts] = None,
    text: Option[TextOpts] = None,
    string: Option[StringOpts] = None,
    integer: Option[IntegerOpts] = None,
    float: Option[FloatOpts] = None,
    stringArray: Option[StringArrayOpts] = None,
    and: Seq[Query] = Nil,
    or: Seq[Query] = Nil)

object Op {
  val Equals = "equals"
  val NotEquals = "notEquals"
  val StartsWith = "startsWith"
  val GreaterThan = "greaterThan"
  val GreaterOrEq = "greaterThanOrEquals"
  val LessThan = "lessThan"
  val LessOrEq = "lessThanOrEquals"
  val InRange = "inRange"
  val ContainsAll = "containsAll"
  val ContainsAny = "containsAny"
  val Near = "near"
  val comparisons: Set[String] =
    Set(Equals, NotEquals, GreaterThan, GreaterOrEq, LessThan, LessOrEq, InRange)
}

/** `approx` (an extension knob, default false): serve this operator from
  * the collection's fitted quantizer artifact when one is attached —
  * quantized candidate scan + exact re-rank. Exact search remains the
  * default and the fallback when no artifact exists.
  */
final case class VectorFlatOpts(
    vector: Seq[Float], operator: String, limit: Int,
    filter: Option[Query] = None, weight: Option[Float] = None,
    approx: Boolean = false)

final case class VectorVamanaOpts(
    vector: Seq[Float], operator: String, searchSize: Int, limit: Int,
    filter: Option[Query] = None, weight: Option[Float] = None,
    approx: Boolean = false)

final case class TextOpts(
    value: String, operator: String, limit: Int,
    filter: Option[Query] = None, weight: Option[Float] = None)

final case class StringOpts(value: String, operator: String, endValue: String = "")

final case class IntegerOpts(value: Long, operator: String, endValue: Long = 0L)

final case class FloatOpts(value: Double, operator: String, endValue: Double = 0.0)

final case class StringArrayOpts(value: Seq[String], operator: String)

final case class SortOption(property: String, descending: Boolean = false)

/** Full request envelope (reference models/search.go:19–50). */
final case class SearchRequest(
    query: Query,
    select: Seq[String] = Nil,
    sort: Seq[SortOption] = Nil,
    offset: Int = 0,
    limit: Int = 10)

object Validation {
  private def err(m: String): Either[String, Unit] = Left(m)
  private val ok: Either[String, Unit] = Right(())

  /** Static (schema-free) validation; bounds match the reference exactly
    * (models/search.go Validate methods).
    */
  def validate(r: SearchRequest): Either[String, Unit] =
    for {
      _ <- validateQuery(r.query)
      _ <- if (r.sort.length > 10) err("sort options exceed maximum of 10") else ok
      _ <- r.sort.collectFirst { case s if s.property.isEmpty => "sorting property cannot be empty" }.toLeft(())
      _ <- if (r.offset < 0) err("offset must be greater than or equal to 0") else ok
      _ <- if (r.limit < 1 || r.limit > 100) err("limit must be between 1 and 100") else ok
    } yield ()

  def validateQuery(q: Query): Either[String, Unit] =
    for {
      _ <- if (q.property.isEmpty) err("query property cannot be empty") else ok
      _ <- q.vectorFlat.map(validateVectorFlat).getOrElse(ok)
      _ <- q.vectorVamana.map(validateVectorVamana).getOrElse(ok)
      _ <- q.text.map(validateText).getOrElse(ok)
      _ <- q.string.map(validateString).getOrElse(ok)
      _ <- q.integer.map(o => validateCmp(o.operator, o.endValue > o.value, "integer")).getOrElse(ok)
      _ <- q.float.map(o => validateCmp(o.operator, o.endValue > o.value, "float")).getOrElse(ok)
      _ <- q.stringArray.map(validateStringArray).getOrElse(ok)
      _ <- if (q.property == "_and" && q.and.isEmpty) err("and query must have at least one subquery") else ok
      _ <- if (q.property == "_or" && q.or.isEmpty) err("or query must have at least one subquery") else ok
      _ <- firstLeft(q.and.map(validateQuery))
      _ <- firstLeft(q.or.map(validateQuery))
      _ <- if (q.property == "_id") validateId(q) else ok
    } yield ()

  private def firstLeft(es: Seq[Either[String, Unit]]): Either[String, Unit] =
    es.collectFirst { case Left(m) => m }.toLeft(())

  private def validateId(q: Query): Either[String, Unit] = (q.string, q.stringArray) match {
    case (Some(s), _) if s.operator != Op.Equals =>
      err(s"invalid operator ${s.operator} for _id, expected equals")
    case (_, Some(sa)) if sa.operator != Op.ContainsAny =>
      err(s"invalid operator ${sa.operator} for _id, expected containsAny")
    case (None, None) => err("invalid query for _id, expected string or stringArray")
    case _ => ok
  }

  private def validateVectorFlat(o: VectorFlatOpts): Either[String, Unit] =
    for {
      _ <- vecBounds(o.vector)
      _ <- if (o.operator != Op.Near) err(s"invalid operator ${o.operator} for vector query") else ok
      _ <- limit75(o.limit)
      _ <- o.filter.map(validateQuery).getOrElse(ok)
    } yield ()

  private def validateVectorVamana(o: VectorVamanaOpts): Either[String, Unit] =
    for {
      _ <- vecBounds(o.vector)
      _ <- if (o.operator != Op.Near) err(s"invalid operator ${o.operator} for vector query") else ok
      _ <- if (o.searchSize < 25 || o.searchSize > 75) err(s"invalid searchSize ${o.searchSize}, expected 25-75") else ok
      _ <- limit75(o.limit)
      _ <- if (o.searchSize < o.limit) err("searchSize must be greater than or equal to limit") else ok
      _ <- o.filter.map(validateQuery).getOrElse(ok)
    } yield ()

  private def validateText(o: TextOpts): Either[String, Unit] =
    for {
      _ <- if (o.value.isEmpty) err("text query value cannot be empty") else ok
      _ <- if (o.operator != Op.ContainsAll && o.operator != Op.ContainsAny)
             err(s"invalid operator ${o.operator} for text query") else ok
      _ <- limit75(o.limit)
      _ <- o.filter.map(validateQuery).getOrElse(ok)
    } yield ()

  private def validateString(o: StringOpts): Either[String, Unit] =
    for {
      _ <- if (o.value.isEmpty) err("string query value cannot be empty") else ok
      _ <- if (o.operator == Op.StartsWith || Op.comparisons(o.operator))
             ok else err(s"invalid operator ${o.operator} for string query")
      _ <- if (o.operator == Op.InRange && utf8Compare(o.endValue, o.value) <= 0)
             err("endValue must be greater than value for string range query") else ok
    } yield ()

  /** UTF-8 byte order — the order the ENGINE actually filters with
    * (Spark's UTF8String), the oracle's binary collation, and the
    * reference's []byte keys. Java String.compareTo (UTF-16 code units)
    * disagrees for [U+E000, U+FFFF] vs supplementary-plane characters, so
    * validating with it would accept/reject ranges the engine orders the
    * other way.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private def validateCmp(op: String, rangeOk: => Boolean, kind: String): Either[String, Unit] =
    if (!Op.comparisons(op)) err(s"invalid operator $op for $kind query")
    else if (op == Op.InRange && !rangeOk) err(s"endValue must be greater than value for $kind range query")
    else ok

  private def validateStringArray(o: StringArrayOpts): Either[String, Unit] =
    for {
      _ <- if (o.value.isEmpty) err("stringArray query value cannot be empty") else ok
      _ <- if (o.operator != Op.ContainsAll && o.operator != Op.ContainsAny)
             err(s"invalid operator ${o.operator} for stringArray query") else ok
    } yield ()

  private def vecBounds(v: Seq[Float]): Either[String, Unit] =
    if (v.isEmpty || v.length > IndexSchema.MaxVectorSize)
      err(s"query vector length must be between 1 and 4096, got ${v.length}")
    else ok

  private def limit75(l: Int): Either[String, Unit] =
    if (l < 1 || l > 75) err(s"invalid limit $l, expected 1-75") else ok

  /** Schema-aware validation (reference models/search.go:155–235). */
  def validateSchema(q: Query, schema: IndexSchema): Either[String, Unit] = q.property match {
    case "_and" => firstLeft(q.and.map(validateSchema(_, schema)))
    case "_or" => firstLeft(q.or.map(validateSchema(_, schema)))
    case "_id" => ok
    case p =>
      schema.get(p) match {
        case None => err(s"property $p not found in index schema, cannot query")
        case Some(kind) => (kind, q) match {
          case (IndexKind.VectorFlat(n, _, _), Query(_, Some(o), _, _, _, _, _, _, _, _)) =>
            if (o.vector.length != n) err(s"vector length mismatch for $p, expected $n got ${o.vector.length}")
            else o.filter.map(validateSchema(_, schema)).getOrElse(ok)
          case (IndexKind.VectorVamana(n, _, _, _, _, _), Query(_, _, Some(o), _, _, _, _, _, _, _)) =>
            if (o.vector.length != n) err(s"vector length mismatch for $p, expected $n got ${o.vector.length}")
            else o.filter.map(validateSchema(_, schema)).getOrElse(ok)
          case (_: IndexKind.Text, Query(_, _, _, Some(o), _, _, _, _, _, _)) =>
            o.filter.map(validateSchema(_, schema)).getOrElse(ok)
          case (_: IndexKind.Str, q2) if q2.string.isDefined => ok
          case (_: IndexKind.StrArray, q2) if q2.stringArray.isDefined => ok
          case (IndexKind.Integer, q2) if q2.integer.isDefined => ok
          case (IndexKind.Float, q2) if q2.float.isDefined => ok
          case _ => err(s"${kind.name} query options not provided for property $p")
        }
      }
  }
}
