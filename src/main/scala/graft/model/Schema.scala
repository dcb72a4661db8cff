package graft.model

/** Collection index schema: which properties are queryable and how.
  *
  * Mirrors the reference's `IndexSchema` (reference models/index.go:10–28):
  * a map from (possibly dotted) property path to one of seven index types.
  * In this engine an "index" is a typed DataFrame column plus, for text,
  * a derived postings DataFrame; schema declaration drives query-time
  * validation exactly like the reference's `ValidateSchema`.
  */
sealed trait IndexKind { def name: String }

object IndexKind {
  /** Distance metrics (reference distance/distance.go:70–94). */
  sealed abstract class Metric(val name: String)
  object Metric {
    case object Euclidean extends Metric("euclidean") // squared L2, no sqrt
    case object Cosine extends Metric("cosine")       // 1 - dot, assumes normalized input
    case object Dot extends Metric("dot")             // -dot
    case object Haversine extends Metric("haversine") // great-circle meters, [lat,lon] deg
    case object Hamming extends Metric("hamming")     // popcount(xor) after 0.5-binarize
    case object Jaccard extends Metric("jaccard")     // 1 - |and|/|or| after 0.5-binarize
    val all: Seq[Metric] = Seq(Euclidean, Cosine, Dot, Haversine, Hamming, Jaccard)
    def parse(s: String): Metric = all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown distance metric: $s"))
  }

  final case class VectorFlat(vectorSize: Int, metric: Metric) extends IndexKind {
    val name = "vectorFlat"
  }
  /** Vamana params accepted for parity; `near` executes as exact top-k
    * (a strict superset of the reference's approximate recall).
    */
  final case class VectorVamana(
      vectorSize: Int, metric: Metric,
      searchSize: Int = 75, degreeBound: Int = 64, alpha: Double = 1.2)
    extends IndexKind { val name = "vectorVamana" }
  final case class Text(analyser: String = "standard") extends IndexKind {
    val name = "text"
  }
  final case class Str(caseSensitive: Boolean = false) extends IndexKind {
    val name = "string"
  }
  final case class StrArray(caseSensitive: Boolean = false) extends IndexKind {
    val name = "stringArray"
  }
  case object Integer extends IndexKind { val name = "integer" }
  case object Float extends IndexKind { val name = "float" }
}

final case class IndexSchema(props: Map[String, IndexKind]) {
  def get(property: String): Option[IndexKind] = props.get(property)
}

object IndexSchema {
  def apply(entries: (String, IndexKind)*): IndexSchema = IndexSchema(entries.toMap)

  /** Validation bounds from the reference (models/index.go:249–340). */
  val MaxVectorSize = 4096
  def validate(schema: IndexSchema): Either[String, Unit] = {
    schema.props.collectFirst {
      case (p, IndexKind.VectorFlat(n, m)) if badVec(n, m) =>
        s"property $p: invalid vector size $n for metric ${m.name}"
      case (p, IndexKind.VectorVamana(n, m, ss, db, a))
          if badVec(n, m) || ss < 25 || ss > 75 || db < 32 || db > 64 || a < 1.1 || a > 1.5 =>
        s"property $p: invalid vamana parameters"
      case (p, IndexKind.Text(a)) if a != "standard" =>
        s"property $p: unknown analyser $a"
    }.toLeft(())
  }
  private def badVec(n: Int, m: IndexKind.Metric): Boolean =
    n < 1 || n > MaxVectorSize || (m == IndexKind.Metric.Haversine && n != 2)
}
