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

  /** Vector compression declared on the index (reference
    * models/quantizer.go:51–76): `NoQuant` stores raw vectors; the others
    * are FITTED LAZILY by the store once the collection holds
    * `triggerThreshold` vectors (reference trains on the shard the same
    * way, vectorstore/product.go:175–183 / binary Fit).
    */
  sealed trait Quantizer { def name: String }
  object Quantizer {
    case object NoQuant extends Quantizer { val name = "none" }
    final case class Binary(triggerThreshold: Int = 10000) extends Quantizer {
      val name = "binary"
    }
    final case class Product(
        numCentroids: Int = 256, numSubVectors: Int = 8,
        triggerThreshold: Int = 10000) extends Quantizer { val name = "product" }
    /** SQ8 per-dimension grid — a graft extension beyond the reference's
      * binary/product pair (faiss's SQ family; the size/recall middle
      * point). Fitted from exact per-dim min/max at the trigger.
      */
    final case class Scalar(triggerThreshold: Int = 10000) extends Quantizer {
      val name = "scalar"
    }
    /** Optimized PQ (Ge et al. 2013 — operators/Opq.scala): a learned
      * orthogonal rotation aligns the subspace split with the corpus's
      * principal axes, then plain PQ in the rotated space. Same code
      * width and candidate-scan cost as [[Product]]; better codebook
      * fit on correlated/anisotropic corpora. A graft extension beyond
      * the reference's binary/product pair.
      */
    final case class Opq(
        numCentroids: Int = 256, numSubVectors: Int = 8,
        triggerThreshold: Int = 10000) extends Quantizer { val name = "opq" }
    /** RaBitQ (Gao & Long, SIGMOD 2024 — operators/RaBitQ.scala): 1 bit
      * per dimension plus three scalars per vector, with an UNBIASED
      * distance estimator and an O(1/√D) error bound — the binary
      * quantizer's byte budget with magnitude-aware ranking. A graft
      * extension beyond the reference's binary/product pair.
      */
    final case class RaBitQ(triggerThreshold: Int = 10000) extends Quantizer {
      val name = "rabitq"
    }
  }

  final case class VectorFlat(
      vectorSize: Int, metric: Metric,
      quantizer: Quantizer = Quantizer.NoQuant) extends IndexKind {
    val name = "vectorFlat"
  }
  /** Vamana params accepted for parity; `near` executes as exact top-k
    * (a strict superset of the reference's approximate recall).
    */
  final case class VectorVamana(
      vectorSize: Int, metric: Metric,
      searchSize: Int = 75, degreeBound: Int = 64, alpha: Double = 1.2,
      quantizer: Quantizer = Quantizer.NoQuant)
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

  /** Property names the query language owns: a schema declaring them
    * would create an index the combinator/id dispatch intercepts before
    * any schema lookup — declared but permanently unqueryable.
    */
  val ReservedProps: Set[String] = Set("_and", "_or", "_id")

  def validate(schema: IndexSchema): Either[String, Unit] = {
    schema.props.collectFirst {
      case (p, _) if p.isEmpty || ReservedProps(p) =>
        s"property name '$p' is reserved or empty"
      case (p, IndexKind.VectorFlat(n, m, q)) if badVec(n, m) || badQuant(n, q) =>
        s"property $p: invalid vector size $n / quantizer for metric ${m.name}"
      case (p, IndexKind.VectorVamana(n, m, ss, db, a, q))
          if badVec(n, m) || badQuant(n, q) ||
            // bound checks written CLOSED so NaN fails them: `a < 1.1 ||
            // a > 1.5` is false for NaN and would fail open into the
            // graph pruner, where every alpha comparison silently misfires
            ss < 25 || ss > 75 || db < 32 || db > 64 || !(a >= 1.1 && a <= 1.5) =>
        s"property $p: invalid vamana parameters"
      case (p, IndexKind.Text(a)) if a != "standard" =>
        s"property $p: unknown analyser $a"
    }.toLeft(())
  }
  private def badVec(n: Int, m: IndexKind.Metric): Boolean =
    n < 1 || n > MaxVectorSize || (m == IndexKind.Metric.Haversine && n != 2)
  /** Quantizer bounds (reference models/quantizer.go validation). */
  private def badQuant(n: Int, q: IndexKind.Quantizer): Boolean = q match {
    case IndexKind.Quantizer.NoQuant => false
    case IndexKind.Quantizer.Binary(t) => t < 1
    case IndexKind.Quantizer.Scalar(t) => t < 1
    case IndexKind.Quantizer.Product(kc, m, t) =>
      t < 1 || kc < 2 || kc > 256 || m < 1 || n % m != 0
    case IndexKind.Quantizer.Opq(kc, m, t) =>
      t < 1 || kc < 2 || kc > 256 || m < 1 || n % m != 0
    case IndexKind.Quantizer.RaBitQ(t) => t < 1
  }
}
