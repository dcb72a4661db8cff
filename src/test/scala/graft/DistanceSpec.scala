package graft

import org.apache.spark.sql.functions._
import graft.functions.{Distances, VectorDistance}
import graft.model.IndexKind.Metric

/** Distance kernels: native expression vs builtin HOF formulation vs a
  * naive Scala loop oracle, plus codegen sanity (the expression must stay
  * inside WholeStageCodegen in a realistic near plan).
  */
class DistanceSpec extends SparkSuite {
  import spark.implicits._

  val rnd = new scala.util.Random(42)
  val vecs: Seq[(String, Array[Float])] =
    (0 until 200).map(i => (i.toString, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
  lazy val df = vecs.toDF("_id", "v")
  val q: Array[Float] = Array.fill(16)(rnd.nextFloat() * 2 - 1)

  def naive(m: Metric, a: Array[Float], b: Array[Float]): Double = m match {
    case Metric.Euclidean => a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    case Metric.Dot => -a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    case Metric.Cosine => 1.0 - a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    case Metric.Hamming => a.zip(b).count { case (x, y) => (x > 0.5f) != (y > 0.5f) }.toDouble
    case Metric.Jaccard =>
      val inter = a.zip(b).count { case (x, y) => x > 0.5f && y > 0.5f }
      val union = a.zip(b).count { case (x, y) => x > 0.5f || y > 0.5f }
      if (union == 0) 0.0 else 1.0 - inter.toDouble / union
    case Metric.Haversine =>
      VectorDistance.haversineDegrees(a(0), a(1), b(0), b(1))
  }

  for (m <- Seq(Metric.Euclidean, Metric.Dot, Metric.Cosine, Metric.Hamming, Metric.Jaccard)) {
    test(s"${m.name}: expression matches naive loop and builtin formulation") {
      val got = df.select(col("_id"), Distances.distanceToQuery(m, col("v"), q.toSeq).as("d"))
        .collect().map(r => r.getAs[String]("_id") -> r.getAs[Double]("d")).toMap
      val viaBuiltins = df.select(col("_id"),
          Distances.distanceBuiltins(m, col("v"), lit(q)).as("d"))
        .collect().map(r => r.getAs[String]("_id") -> r.getAs[Double]("d")).toMap
      vecs.foreach { case (id, v) =>
        val expect = naive(m, v, q)
        assert(math.abs(got(id) - expect) < 1e-9, s"id=$id expr")
        assert(math.abs(viaBuiltins(id) - expect) < 1e-9, s"id=$id builtins")
      }
    }
  }

  test("haversine: expression matches naive for degree pairs") {
    val geo = Seq(("a", Array(51.5f, -0.12f)), ("b", Array(40.7f, -74.0f)), ("c", Array(-33.9f, 151.2f)))
    val gdf = geo.toDF("_id", "v")
    val qv = Seq(48.85f, 2.35f) // Paris
    val got = gdf.select(col("_id"), Distances.distanceToQuery(Metric.Haversine, col("v"), qv).as("d"))
      .collect().map(r => r.getAs[String]("_id") -> r.getAs[Double]("d")).toMap
    geo.foreach { case (id, v) =>
      assert(math.abs(got(id) - naive(Metric.Haversine, v, qv.toArray)) < 1e-6)
    }
    // London–Paris is ~344 km
    assert(math.abs(got("a") - 344000.0) < 5000.0)
  }

  test("near plan stays in whole-stage codegen with TakeOrdered") {
    // parquet-backed input (a local relation would be constant-folded away)
    val emb = Tables.embeddings(spark, sf0001)
    val qv = (0 until 64).map(_ => 0.1f)
    val plan = emb.select(col("vec_id"),
        Distances.distanceToQuery(Metric.Cosine, col("embedding"), qv).as("d"))
      .orderBy("d").limit(5)
    val physical = plan.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"), physical)
    // "*(1) Project [...]" marks the project as inside WholeStageCodegen stage 1
    assert(physical.contains("*(1) Project"), physical)
    assert(plan.collect().length == 5)
  }
}
