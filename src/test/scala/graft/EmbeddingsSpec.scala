package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

/** Laws for the JL sparse-sign projection: the Scala/SQL sign parity
  * lockstep, the distance-preservation property that justifies JL,
  * norm preservation in expectation, layout independence, and guards.
  */
class EmbeddingsSpec extends SparkSuite {
  import spark.implicits._

  test("sign matrix parity matches the SQL md5 replay exactly") {
    val pairs = for (i <- 0 until 8; j <- 0 until 4) yield (i, j)
    val exprs = pairs.map { case (i, j) => Embeddings.sqlSign(i, j) }
    val fromSql = spark.sql(s"SELECT ${exprs.mkString(", ")}").head()
    pairs.zipWithIndex.foreach { case ((i, j), n) =>
      assert(fromSql.getAs[java.math.BigDecimal](n).doubleValue ===
        Embeddings.signAt(i, j, "graft-jl"), s"($i,$j)")
    }
  }

  private def randVecs(n: Int, d: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(d)(rnd.nextGaussian().toFloat)))
  }

  test("JL property: pairwise squared distances preserved within tolerance at k=32") {
    val data = randVecs(120, 64, seed = 5)
    val df = data.toDF("vid", "vec")
    val proj = Embeddings.jlProject(df, $"vid", $"vec", dIn = 64, dOut = 32)
      .collect().map(r => r.getLong(0) -> (1 until 33).map(r.getDouble).toArray).toMap
    val orig = data.map { case (i, v) => i -> v.map(_.toDouble).toArray }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val rnd = new scala.util.Random(6)
    val distortions = (0 until 150).map { _ =>
      val i = rnd.nextInt(120).toLong; var j = rnd.nextInt(120).toLong
      if (i == j) j = (j + 1) % 120
      val t = d2(orig(i), orig(j)); val p = d2(proj(i), proj(j))
      math.abs(p - t) / t
    }
    val mean = distortions.sum / distortions.size
    assert(mean < 0.35, f"mean distortion $mean%.3f")
    assert(distortions.count(_ > 1.0) <= 3, "distortion tail too heavy")
  }

  test("norm preserved in expectation") {
    val data = randVecs(200, 64, seed = 9)
    val df = data.toDF("vid", "vec")
    val proj = Embeddings.jlProject(df, $"vid", $"vec", 64, 32)
    val pn = proj.select((1 until 33).map(j => col(s"p${j - 1}") * col(s"p${j - 1}"))
      .reduce(_ + _).as("n2")).agg(avg($"n2")).as[Double].head()
    val on = data.map(_._2.map(x => x.toDouble * x).sum).sum / data.size
    assert(math.abs(pn - on) / on < 0.2, s"avg norm² $pn vs $on")
  }

  test("layout independence and short/null vectors dropped") {
    val e = Tables.embeddings(spark, sf001)
    val a = Embeddings.jlProject(e, $"vec_id", $"embedding", 64, 8)
    val b = Embeddings.jlProject(e.repartition(9, $"label"), $"vec_id", $"embedding", 64, 8)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    val withBad = Seq((1L, Seq(1.0f, 2.0f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vid", "vec")
    assert(Embeddings.jlProject(withBad, $"vid", $"vec", 64, 8).count() === 0)
  }

  test("guards: dims positive, projection must reduce") {
    val df = Seq((1L, Seq(1.0f))).toDF("vid", "vec")
    intercept[IllegalArgumentException](Embeddings.jlProject(df, $"vid", $"vec", 0, 1))
    intercept[IllegalArgumentException](Embeddings.jlProject(df, $"vid", $"vec", 4, 8))
  }

  // Round 11: replicatePerturbed and jlLift moved to compiled per-row
  // loops (the interpreted-HOF quadratic collapse made them minutes/row
  // at 1536-d). These laws pin the new paths BIT-IDENTICAL to the inline
  // Spark-expression forms they replaced, at the dimensionality where the
  // old forms were still runnable — every recall number measured on the
  // old corpora stays valid.

  test("replicatePerturbed is bit-identical to the inline expression form") {
    val e = Tables.embeddings(spark, sf001).limit(60)
    val got = Embeddings.replicatePerturbed(e, $"vec_id", $"embedding", 3, 0.05)
    val step = e.agg(max($"vec_id".cast("long"))).head().getLong(0) + 1
    // the replaced implementation, reconstructed literally (noise from
    // xxhash64(base, rep, i, salt), perturb, double-fold norm, divide)
    val noise = (base: org.apache.spark.sql.Column,
        rep: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      (((pmod(xxhash64(base, rep, i, lit("graft-scale")), lit(20001L)) - lit(10000L))
        / lit(10000.0)) * lit(0.05)).cast("float")
    val want = e.filter($"embedding".isNotNull)
      .select($"vec_id".cast("long").as("_base"), $"embedding".cast("array<float>").as("_v"))
      .crossJoin(spark.range(3).select(col("id").as("_rep")))
      .withColumn("_p", transform($"_v", (x, i) =>
        x + when($"_rep" === 0, lit(0.0f)).otherwise(noise($"_base", $"_rep", i))))
      .withColumn("_n", sqrt(aggregate($"_p", lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .select(($"_base" + $"_rep" * step).as("vec_id"),
        transform($"_p", x => (x.cast("double") / $"_n").cast("float")).as("embedding"))
    val g = got.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val w = want.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(g.length == w.length && g.length == 180)
    g.zip(w).foreach { case ((gi, gv), (wi, wv)) =>
      assert(gi == wi && gv == wv, s"drift at vec_id $gi")
    }
  }

  test("jlLift is bit-identical to the inline expression form") {
    val e = Tables.embeddings(spark, sf001).limit(40)
    val got = Embeddings.jlLift(e, $"vec_id", $"embedding", dIn = 64, dOut = 96)
    val sign = (i: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =>
      when(pmod(xxhash64(i, j, lit("graft-jl-lift")), lit(2L)) === 0L, lit(1.0d))
        .otherwise(lit(-1.0d))
    val want = e.filter($"embedding".isNotNull && size($"embedding") >= 64)
      .select($"vec_id".cast("long").as("vec_id"), $"embedding".cast("array<float>").as("_v"))
      .withColumn("_y", transform(sequence(lit(0), lit(95)), j =>
        aggregate(sequence(lit(0), lit(63)), lit(0.0d), (acc, i) =>
          acc + element_at($"_v", i + 1).cast("double") * sign(i, j))))
      .withColumn("_n", sqrt(aggregate($"_y", lit(0.0d), (acc, x) => acc + x * x)))
      .select($"vec_id", transform($"_y", x => (x / $"_n").cast("float")).as("embedding"))
    val g = got.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val w = want.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(g.length == w.length && g.nonEmpty)
    g.zip(w).foreach { case ((gi, gv), (wi, wv)) =>
      assert(gi == wi && gv == wv, s"drift at vec_id $gi")
    }
  }
}
