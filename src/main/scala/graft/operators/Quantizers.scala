package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PackedOps

/** Index-side vector compression (reference §2.4):
  *
  *  - [[BinaryQuantizer]] — per-dimension mean thresholds (learned like the
  *    reference's `Fit()`, binary.go:145–184), bit-packed into long words;
  *    search runs popcount kernels over the packed column: 32× smaller
  *    scan footprint and 64 dims per instruction.
  *  - [[ProductQuantizer]] — per-subspace k-means codebooks; vectors store
  *    one byte-sized code per subspace; queries precompute the m×k
  *    query→centroid distance table and score rows by m table lookups
  *    (asymmetric distance, product.go:238–305).
  *
  * Both are recall/storage trades on the same `near` surface — exact
  * search stays available on the raw column.
  */
object BinaryQuantizer {

  /** Learn per-dimension mean thresholds (double precision for
    * cross-engine determinism).
    */
  def fit(df: DataFrame, vec: Column, dim: Int): Array[Double] = {
    val sums = df.select(posexplode(vec).as(Seq("_pos", "_v")))
      .groupBy("_pos").agg(avg(col("_v").cast("double")).as("_m"))
      .collect().map(r => r.getAs[Int]("_pos") -> r.getAs[Double]("_m")).toMap
    (0 until dim).map(sums).toArray
  }

  /** Add a packed bits column for `vec` under the learned thresholds. */
  def encode(df: DataFrame, vec: Column, thresholds: Array[Double]): DataFrame =
    df.withColumn("packed", PackedOps.packBits(vec, lit(thresholds)))

  /** Top-k by packed hamming/jaccard distance to a query vector. */
  def search(
      encoded: DataFrame, id: Column, queryVec: Seq[Float],
      thresholds: Array[Double], k: Int, jaccard: Boolean = false): DataFrame = {
    val queryWords = packWords(queryVec, thresholds)
    val d =
      if (jaccard) PackedOps.packedJaccard(col("packed"), lit(queryWords))
      else PackedOps.packedHamming(col("packed"), lit(queryWords))
    encoded
      .select(id.as("id"), d.as("distance"))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)
  }

  /** Driver-side packing of a query vector (same bit layout). */
  def packWords(vec: Seq[Float], thresholds: Array[Double]): Array[Long] = {
    val words = new Array[Long]((vec.length + 63) / 64)
    vec.zipWithIndex.foreach { case (v, i) =>
      if (v.toDouble > thresholds(i)) words(i / 64) |= 1L << (i % 64)
    }
    words
  }
}

/** Per-subspace codebooks: centroids(i)(j) is the j-th centroid of
  * subspace i (length dim/m each).
  */
final case class PQModel(m: Int, k: Int, dim: Int, centroids: Array[Array[Array[Float]]]) {
  val subDim: Int = dim / m
}

object ProductQuantizer {

  /** Learn per-subspace codebooks with seeded k-means (deterministic for a
    * fixed seed + input). MaxIter matches the reference's Lloyd's cap.
    */
  def fit(df: DataFrame, vec: Column, m: Int, k: Int, dim: Int, seed: Long = 42L): PQModel = {
    require(dim % m == 0, s"dim $dim not divisible by numSubVectors $m")
    val subDim = dim / m
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base = df.select(vec.cast("array<double>").as("_v")).persist()
    val centroids = (0 until m).map { i =>
      val sub = base.select(
        array_to_vector(slice(col("_v"), i * subDim + 1, subDim)).as("features"))
      val model = new KMeans().setK(k).setSeed(seed + i).setMaxIter(100)
        .setTol(1e-6).fit(sub)
      model.clusterCenters.map(_.toArray.map(_.toFloat))
    }.toArray
    base.unpersist()
    PQModel(m, k, dim, centroids)
  }

  /** Encode: one code per subspace = argmin centroid by squared L2.
    * (Build-path cost; interpreted HOF is fine here — the hot query path
    * below touches only the byte-sized codes.)
    */
  def encode(df: DataFrame, id: Column, vec: Column, model: PQModel): DataFrame = {
    val cents: Seq[Seq[Seq[Float]]] = model.centroids.map(_.map(_.toSeq).toSeq).toSeq
    val centsLit = typedLit(cents)
    val codeCols = (0 until model.m).map { i =>
      val sub = slice(col("_v"), i * model.subDim + 1, model.subDim)
      val dists = transform(sequence(lit(0), lit(model.k - 1)), j =>
        aggregate(
          zip_with(sub, element_at(element_at(centsLit, i + 1), j + 1),
            (x, c) => (x.cast("double") - c.cast("double")) * (x.cast("double") - c.cast("double"))),
          lit(0.0d), (acc, x) => acc + x))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    df.select(id.as("id"), vec.as("_v"))
      .withColumn("codes", array(codeCols.map(c => c): _*))
      .select("id", "codes")
  }

  /** Asymmetric-distance top-k: the query is quantized against nothing —
    * its exact distance to every centroid of every subspace is precomputed
    * into an m×k table, broadcast as a literal, and each row scores as m
    * array lookups.
    */
  def adcSearch(codes: DataFrame, queryVec: Seq[Float], model: PQModel, k: Int): DataFrame = {
    val table: Seq[Seq[Double]] = (0 until model.m).map { i =>
      val sub = queryVec.slice(i * model.subDim, (i + 1) * model.subDim)
      (0 until model.k).map { j =>
        val c = model.centroids(i)(j)
        sub.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      }
    }
    val tableLit = typedLit(table)
    val approx = aggregate(
      sequence(lit(0), lit(model.m - 1)),
      lit(0.0d),
      (acc, i) => acc +
        element_at(element_at(tableLit, i + 1), element_at(col("codes"), i + 1) + 1))
    codes
      .select(col("id"), approx.as("approx_distance"))
      .orderBy(col("approx_distance").asc, col("id").asc)
      .limit(k)
  }
}
