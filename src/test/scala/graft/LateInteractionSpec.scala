package graft

import org.apache.spark.sql.functions._
import graft.operators.LateInteraction

/** Laws for MaxSim late-interaction scoring: hand-computed fixture, the
  * one-relevant-passage property that motivates the operator, zero-norm
  * and malformed rows, layout independence, and guards.
  */
class LateInteractionSpec extends SparkSuite {
  import spark.implicits._

  test("hand fixture: sum of per-query best matches") {
    // group 1 holds unit vectors e1 and e2; group 2 holds only e1.
    // queries: e1 and e2. group 1 scores 1+1=2; group 2 scores 1+0=1.
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(1.0f, 0.0f)))
      .toDF("g", "v")
    val out = LateInteraction.maxSimScore(corpus, $"g", $"v",
        Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), dIn = 2)
      .orderBy("group").as[(Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2.0), (2L, 1.0)))
  }

  test("one relevant passage carries a long document") {
    val rnd = new scala.util.Random(13)
    def noise() = Seq.fill(8)((rnd.nextGaussian() * 0.1).toFloat)
    val signal = Seq(1.0f, 1.0f, 1.0f, 1.0f, 0f, 0f, 0f, 0f)
    // doc 1: 9 noise vectors + ONE passage matching the query;
    // doc 2: 10 noise vectors
    val corpus = ((1 to 9).map(_ => (1L, noise())) :+ ((1L, signal))) ++
      (1 to 10).map(_ => (2L, noise()))
    val out = LateInteraction.maxSimScore(corpus.toDF("g", "v"), $"g", $"v",
        Seq(signal.map(_.toDouble)), dIn = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > 0.99, s"relevant passage should dominate: ${out(1L)}")
    assert(out(1L) > out(2L) + 0.3)
  }

  test("zero-norm, null, and short vectors are skipped, not poison") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)))
      .toDF("g", "v")
      .union(Seq((3L, null.asInstanceOf[Seq[Float]]), (4L, Seq(1.0f))).toDF("g", "v"))
    val out = LateInteraction.maxSimScore(corpus, $"g", $"v",
        Seq(Seq(1.0, 0.0)), dIn = 2)
      .as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 1.0)) // groups 2-4 had no scoreable vectors
  }

  test("layout independence on real embeddings") {
    val e = Tables.embeddings(spark, sf0001)
    val q = Seq((0 until 64).map(i => if (i % 2 == 0) 1.0 else -1.0))
    val a = LateInteraction.maxSimScore(e, $"label", $"embedding", q, 64)
    val b = LateInteraction.maxSimScore(e.repartition(7, $"vec_id"), $"label", $"embedding", q, 64)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    assert(a.count() > 0)
  }

  test("guards: empty queries, bad dims, zero-norm query") {
    val df = Seq((1L, Seq(1.0f))).toDF("g", "v")
    intercept[IllegalArgumentException](
      LateInteraction.maxSimScore(df, $"g", $"v", Seq.empty, 1))
    intercept[IllegalArgumentException](
      LateInteraction.maxSimScore(df, $"g", $"v", Seq(Seq(1.0, 2.0)), 1))
    intercept[IllegalArgumentException](
      LateInteraction.maxSimScore(df, $"g", $"v", Seq(Seq(0.0)), 1))
  }
}
