package graft

import org.apache.spark.sql.functions._
import graft.functions.{Distances, PackedOps}
import graft.operators.{BinaryQuantizer, ProductQuantizer}
import graft.model.IndexKind.Metric

class QuantizerSpec extends SparkSuite {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001)
  lazy val exact10: Seq[Long] = {
    val qv = graft.queries.TestCollections.queryVector(spark, sf0001, 7)
    emb.select(col("vec_id"),
        Distances.distanceToQuery(Metric.Euclidean, col("embedding"), qv).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
  }

  test("packed hamming equals elementwise hamming on 0/1 vectors") {
    val zeros = Array.fill(64)(0.5)
    val bits = emb.select(col("vec_id"),
      transform(col("embedding"), x => when(x > 0f, 1.0f).otherwise(0.0f)).as("b"))
    val packed = bits.withColumn("packed", PackedOps.packBits(col("b"), lit(zeros)))
    val qbits = graft.queries.TestCollections.queryVector(spark, sf0001, 0)
      .map(x => if (x > 0f) 1.0f else 0.0f)
    val qWords = BinaryQuantizer.packWords(qbits, zeros)
    val viaPacked = packed
      .select(col("vec_id"), PackedOps.packedHamming(col("packed"), lit(qWords)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaElems = bits
      .select(col("vec_id"), Distances.distanceToQuery(Metric.Hamming, col("b"), qbits).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaPacked == viaElems)
  }

  test("packed jaccard matches the elementwise kernel") {
    val zeros = Array.fill(64)(0.5)
    val bits = emb.select(col("vec_id"),
      transform(col("embedding"), x => when(x > 0f, 1.0f).otherwise(0.0f)).as("b"))
    val packed = bits.withColumn("packed", PackedOps.packBits(col("b"), lit(zeros)))
    val qbits = graft.queries.TestCollections.queryVector(spark, sf0001, 3)
      .map(x => if (x > 0f) 1.0f else 0.0f)
    val qWords = BinaryQuantizer.packWords(qbits, zeros)
    val viaPacked = packed
      .select(col("vec_id"), PackedOps.packedJaccard(col("packed"), lit(qWords)).as("d"))
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1e9)).toMap
    val viaElems = bits
      .select(col("vec_id"), Distances.distanceToQuery(Metric.Jaccard, col("b"), qbits).as("d"))
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1e9)).toMap
    assert(viaPacked == viaElems)
  }

  test("bq fit learns per-dimension means; self-search returns the query first") {
    val th = BinaryQuantizer.fit(emb, col("embedding"), 64)
    assert(th.length == 64)
    val encoded = BinaryQuantizer.encode(emb, col("embedding"), th)
    val qv = graft.queries.TestCollections.queryVector(spark, sf0001, 0)
    val top = BinaryQuantizer.search(encoded, col("vec_id"), qv, th, k = 5).collect()
    assert(top.head.getAs[Long]("id") == 0L)
    assert(top.head.getAs[Double]("distance") == 0.0)
  }

  test("pq: codes in range, encoding deterministic, ADC recall beats random") {
    val model = ProductQuantizer.fit(emb, col("embedding"), m = 8, k = 32, dim = 64)
    assert(model.centroids.length == 8 && model.centroids.forall(_.length == 32))
    val codes = ProductQuantizer.encode(emb, col("vec_id"), col("embedding"), model)
    val sample = codes.limit(50).collect()
    sample.foreach { r =>
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 32))
    }
    // deterministic given the seed
    val model2 = ProductQuantizer.fit(emb, col("embedding"), m = 8, k = 32, dim = 64)
    assert(model.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      model2.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    // recall@10 of ADC vs exact euclidean top-10 (500 vectors): approximate
    // but far above the random baseline of 10/500
    val qv = graft.queries.TestCollections.queryVector(spark, sf0001, 7)
    val adc10 = ProductQuantizer.adcSearch(codes, qv, model, k = 10)
      .select("id").as[Long].collect().toSet
    val recall = exact10.count(adc10.contains).toDouble / 10
    assert(recall >= 0.3, s"ADC recall@10 = $recall")
  }

  test("bq rescored search: quantized candidates + exact re-rank ≈ exact top-k") {
    val th = BinaryQuantizer.fit(emb, col("embedding"), 64)
    val encoded = BinaryQuantizer.encode(
      emb.select(col("vec_id"), col("embedding")), col("embedding"), th)
    val qv = graft.queries.TestCollections.queryVector(spark, sf0001, 7)
    val exactCos = emb.select(col("vec_id"),
        Distances.distanceToQuery(Metric.Cosine, col("embedding"), qv).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    val got = BinaryQuantizer.searchRescored(encoded, col("vec_id"), col("embedding"),
        qv, th, k = 10, rescore = 100, Metric.Cosine)
      .select("id").as[Long].collect()
    assert(got.length == 10)
    val recall = exactCos.count(got.contains).toDouble / 10
    assert(recall >= 0.7, s"rescored BQ recall@10 = $recall")
    // re-ranked distances are TRUE metric values: the self-match leads
    assert(got.head == 7L)
  }

  test("pq rescored ADC beats pure ADC; finer codebook beats coarser") {
    val qv = graft.queries.TestCollections.queryVector(spark, sf0001, 7)
    val model = ProductQuantizer.fit(emb, col("embedding"), m = 16, k = 64, dim = 64)
    val codes = ProductQuantizer.encode(emb, col("vec_id"), col("embedding"), model)
    val got = ProductQuantizer.adcSearchRescored(codes, emb, col("vec_id"),
        col("embedding"), qv, model, k = 10, rescore = 100, Metric.Euclidean)
      .select("id").as[Long].collect()
    val recall = exact10.count(got.contains).toDouble / 10
    assert(recall >= 0.8, s"rescored PQ recall@10 = $recall")
  }

  test("RECALL.md operating points hold: BQ+rescore ≥0.76, PQ+rescore ≥0.98") {
    // the EXACT published configuration (RECALL.md, regenerated per
    // round): 5 pinned query ids, rescore = 20·k = 200, mean recall@10 —
    // the regression guard that keeps the table's operating points honest
    // as the quantizer code evolves (the IvfPqSpec spill-assertion
    // convention). Deterministic by construction: canonically-sorted
    // training samples (Similarity.vectorSample), exact threshold fit.
    val d = sf001
    val emb01 = Tables.embeddings(spark, d)
    val qids = Seq(0L, 7L, 99L, 250L, 444L)
    val k = 10
    def exactCos(qv: Seq[Float]): Set[Long] =
      emb01.select(col("vec_id"),
          Distances.distanceToQuery(Metric.Cosine, col("embedding"), qv).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(k)
        .select("vec_id").as[Long].collect().toSet
    val th = BinaryQuantizer.fit(emb01, col("embedding"), 64)
    val encoded = BinaryQuantizer.encode(
      emb01.select(col("vec_id"), col("embedding")), col("embedding"), th)
    val model = ProductQuantizer.fit(emb01, col("embedding"), m = 16, k = 64, dim = 64)
    val codes = ProductQuantizer.encode(emb01, col("vec_id"), col("embedding"), model)
    val (bqHits, pqHits) = qids.map { q =>
      val qv = graft.queries.TestCollections.queryVector(spark, d, q)
      val exact = exactCos(qv)
      val bq = BinaryQuantizer.searchRescored(encoded, col("vec_id"),
          col("embedding"), qv, th, k, rescore = 20 * k, Metric.Cosine)
        .select("id").as[Long].collect().toSet
      val pq = ProductQuantizer.adcSearchRescored(codes, emb01, col("vec_id"),
          col("embedding"), qv, model, k, rescore = 20 * k, Metric.Cosine)
        .select("id").as[Long].collect().toSet
      (exact.count(bq.contains), exact.count(pq.contains))
    }.unzip
    val bqRecall = bqHits.sum.toDouble / (qids.length * k)
    val pqRecall = pqHits.sum.toDouble / (qids.length * k)
    assert(bqRecall >= 0.76, s"BQ+rescore recall $bqRecall below operating point")
    assert(pqRecall >= 0.98, s"PQ+rescore recall $pqRecall below operating point")
  }

  test("rescored search plan: partial top-k candidate cut + broadcast re-rank join") {
    val th = BinaryQuantizer.fit(emb, col("embedding"), 64)
    val encoded = BinaryQuantizer.encode(
      emb.select(col("vec_id"), col("embedding")), col("embedding"), th)
    val qv = graft.queries.TestCollections.queryVector(spark, sf0001, 7)
    val res = BinaryQuantizer.searchRescored(encoded, col("vec_id"), col("embedding"),
      qv, th, k = 10, rescore = 100, Metric.Cosine)
    val plan = res.queryExecution.executedPlan.toString
    // stage 1: hamming candidates via per-partition partial top-k (no sort)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // stage 2: wide vectors fetched only for the candidate rows (broadcast)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("learned k-means IVF: deterministic centroids, self-match, scan reduction") {
    import graft.operators.Similarity
    val cents = Similarity.kmeansCentroids(emb, col("embedding"), kClusters = 16)
    val cents2 = Similarity.kmeansCentroids(emb, col("embedding"), kClusters = 16)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq) // seeded
    val qv = graft.queries.TestCollections.queryVector(spark, sf0001, 7)
    val got = Similarity.kmeansIvfSearch(emb, col("vec_id"), col("embedding"), qv,
      k = 5, Metric.Cosine, cents, nprobe = 2).collect()
    assert(got.length == 5)
    assert(got.head.getAs[Long]("id") == 7L) // own bucket is always probed
    // probing 2/16 buckets scans a strict subset of the corpus
    val scanned = Similarity.kmeansBuckets(emb, col("embedding"), cents)
      .groupBy("bucket").count().orderBy(desc("count")).limit(2)
      .agg(sum("count")).head().getLong(0)
    assert(scanned < emb.count())
  }

  test("k-means IVF rejects dimension mismatches instead of truncating") {
    import graft.operators.Similarity
    val cents = Array(Array(1f, 2f, 3f), Array(4f, 5f, 6f))
    // short query vector: must fail fast, not silently rank on a prefix
    intercept[IllegalArgumentException] {
      Similarity.kmeansIvfSearch(emb, col("vec_id"), col("embedding"),
        Seq(1f, 2f), k = 3, Metric.Cosine, cents, nprobe = 1)
    }
    // short corpus vector: the assignment UDF must fail, not mis-bucket
    val bad = Seq((1L, Array(1f, 2f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.kmeansBuckets(bad, col("embedding"), cents).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("dims")), msgs.mkString(" | "))
  }

  // ---- SQ8 scalar quantizer ---------------------------------------------

  test("sq8: trained min/max fit is exact and layout-independent") {
    import graft.operators.ScalarQuantizer
    val e = Tables.embeddings(spark, sf0001)
    val (lo, hi) = ScalarQuantizer.fitMinMax(e, col("embedding"), 64)
    val (lo2, hi2) = ScalarQuantizer.fitMinMax(
      e.repartition(9, col("label")), col("embedding"), 64)
    assert(lo.toSeq === lo2.toSeq && hi.toSeq === hi2.toSeq)
    assert(lo.zip(hi).forall { case (l, h) => l < h })
  }

  test("sq8: reconstruction error bounded by half a grid step per dim") {
    import spark.implicits._
    import graft.operators.ScalarQuantizer
    val rnd = new scala.util.Random(21)
    val data = (0 until 100).map(i =>
      (i.toLong, Seq.fill(16)((rnd.nextDouble() * 8 - 4).toFloat)))
    val df = data.toDF("vid", "vec")
    val lo = Array.fill(16)(-4.0); val hi = Array.fill(16)(4.0)
    val step = 8.0 / 255.0
    val codes = ScalarQuantizer.encode(df, $"vid", $"vec", lo, hi)
      .as[(Long, Seq[Long])].collect().toMap
    data.foreach { case (id, v) =>
      val c = codes(id)
      v.zipWithIndex.foreach { case (x, i) =>
        val xhat = -4.0 + c(i) * step
        assert(math.abs(xhat - x) <= step / 2 + 1e-9, s"id $id dim $i")
        assert(c(i) >= 0 && c(i) <= 255)
      }
    }
  }

  test("sq8: approximate top-10 recalls the exact neighbours at 8 bits/dim") {
    import graft.operators.ScalarQuantizer
    import graft.queries.TestCollections
    val e = Tables.embeddings(spark, sf0001)
    val (lo, hi) = ScalarQuantizer.fitMinMax(e, col("embedding"), 64)
    val q = TestCollections.queryVector(spark, sf0001, 3)
    val codes = ScalarQuantizer.encode(e, col("vec_id"), col("embedding"), lo, hi)
    val approx = ScalarQuantizer.search(codes, q, lo, hi, k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val qArr = q.map(_.toDouble).toArray
    val exact = e.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val d2 = v.zip(qArr).map { case (x, y) => (x - y) * (x - y) }.sum
        (r.getLong(0), d2)
      }.sortBy(p => (p._2, p._1)).take(10).map(_._1).toSet
    val recall = (approx & exact).size / 10.0
    assert(recall >= 0.8, s"sq8 recall@10 $recall")
  }

  test("sq8: engine-served approx recalls the exact top-10") {
    import graft.queries.TestCollections
    import graft.model._
    val base = TestCollections.docs(spark, sf0001)
    val (lo, hi) = graft.operators.ScalarQuantizer.fitMinMax(base.df, col("embedding"), 64)
    val coll = base.withScalarVectorIndex("embedding", lo, hi)
    val qv = TestCollections.queryVector(spark, sf0001, 0)
    def ids(approx: Boolean) = graft.engine.Search.search(coll, SearchRequest(
        Query("embedding", vectorFlat = Some(VectorFlatOpts(qv, Op.Near, 10, approx = approx))),
        limit = 100))
      .select("_id").collect().map(_.getString(0)).toSet
    val (ex, ap) = (ids(false), ids(true))
    val recall = (ex & ap).size / 10.0
    assert(recall >= 0.8, s"sq8 engine-served recall@10 $recall")
  }

  test("sq8: degenerate dimension codes to 0; guards fire") {
    import spark.implicits._
    import graft.operators.ScalarQuantizer
    val df = Seq((1L, Seq(3.0f, 7.0f))).toDF("vid", "vec")
    val codes = ScalarQuantizer.encode(df, $"vid", $"vec",
        Array(0.0, 7.0), Array(10.0, 7.0))
      .as[(Long, Seq[Long])].head()
    assert(codes._2(1) === 0L)
    intercept[IllegalArgumentException](
      ScalarQuantizer.encode(df, $"vid", $"vec", Array(0.0), Array(1.0, 2.0)))
    intercept[IllegalArgumentException](
      ScalarQuantizer.search(df.withColumnRenamed("vid", "id"), Seq(1.0f), Array(0.0), Array(1.0), 0))
  }

  test("sq8 fitMinMax: an all-null dimension raises, never silently pins to 0.0") {
    import graft.operators.ScalarQuantizer
    // dimension 0 is null in EVERY row - the boxed-read guard must raise
    // the same error as a missing position (not unbox null to lo=hi=0.0)
    val df = spark.range(4).selectExpr(
      "array(cast(null as float), cast(id as float)) as vec")
    val ex = intercept[IllegalArgumentException](
      ScalarQuantizer.fitMinMax(df, col("vec"), 2))
    assert(ex.getMessage.contains("no values at dimension 0"), ex.getMessage)
  }

  test("dot metric on an UNNORMALIZED corpus: dot-ADC candidates beat L2, engine serves it") {
    import graft.operators.ScalarQuantizer
    import graft.functions.Distances
    import graft.model.IndexKind.Metric
    // deliberately unnormalized: norms spread 1..5 - the regime where
    // reconstructed-L2 candidate ranking buries long vectors
    val scaled = emb.select(col("vec_id"), transform(col("embedding"),
      x => (x.cast("double") * (lit(1.0) + (col("vec_id") % 5).cast("double")))
        .cast("float")).as("v"))
    val qv = scaled.filter(col("vec_id") === 7).select("v").head().getSeq[Float](0)
    val exact = scaled.select(col("vec_id"),
        Distances.distanceToQuery(Metric.Dot, col("v"), qv).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    val (lo, hi) = ScalarQuantizer.fitMinMax(scaled, col("v"), 64)
    val codes = ScalarQuantizer.encode(scaled, col("vec_id"), col("v"), lo, hi)
    def candRecall(dc: org.apache.spark.sql.Column): Double = {
      val cand = codes.select(col("id"), dc.as("ad"))
        .orderBy(col("ad"), col("id")).limit(50)
        .select("id").as[Long].collect().toSet
      exact.count(cand.contains).toDouble / exact.size
    }
    val l2Recall = candRecall(ScalarQuantizer.approxDistance(col("codes"), qv, lo, hi))
    val dotRecall = candRecall(ScalarQuantizer.approxDotDistance(col("codes"), qv, lo, hi))
    assert(dotRecall >= 0.9, s"dot-ADC candidate recall $dotRecall")
    assert(dotRecall > l2Recall,
      s"dot-ADC ($dotRecall) should beat L2-ADC ($l2Recall) on unnormalized dot")
    // engine-served: a Dot-metric scalar artifact answers "approx": true
    // with the same top-10 as exact (candidate budget covers the pool)
    val coll = graft.engine.Collection(
        scaled.select(col("vec_id").cast("string").as("_id"), col("v")),
        graft.model.IndexSchema("v" -> graft.model.IndexKind.VectorFlat(64, Metric.Dot)))
      .withScalarVectorIndex("v", lo, hi)
    def run(approx: Boolean): Seq[String] =
      engine.Search.search(coll, model.SearchRequest(
        model.Query("v", vectorFlat = Some(model.VectorFlatOpts(
          qv, model.Op.Near, 10, approx = approx))),
        limit = 10)).select("_id").as[String].collect().toSeq
    assert(run(approx = true) == run(approx = false))
  }

  test("asymmetric 1-bit ADC: beats symmetric hamming at the same scan width") {
    import graft.operators.BinaryQuantizer
    import graft.functions.Distances
    import graft.model.IndexKind.Metric
    val th = BinaryQuantizer.fit(emb, col("embedding"), 64)
    val (lo64, hi64) = BinaryQuantizer.fitLevels(emb, col("embedding"), 64, th)
    // levels bracket the threshold on every real dimension
    lo64.indices.foreach { i =>
      assert(lo64(i) <= th(i) && hi64(i) >= th(i), s"dim $i: ${lo64(i)} ${th(i)} ${hi64(i)}")
    }
    val encoded = BinaryQuantizer.encode(
      emb.select(col("vec_id"), col("embedding")), col("embedding"), th)
    val qids = Seq(0L, 3L, 77L, 250L, 444L)
    def recallOf(got: Long => Set[Long]): Double = qids.map { qid =>
      val qv = graft.queries.TestCollections.queryVector(spark, sf0001, qid)
      val exact = emb.select(col("vec_id"),
          Distances.distanceToQuery(Metric.Cosine, col("embedding"), qv).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
      exact.count(got(qid).contains).toDouble / 10
    }.sum / qids.size
    def qv(id: Long) = graft.queries.TestCollections.queryVector(spark, sf0001, id)
    val ham = recallOf(id => BinaryQuantizer.search(encoded, col("vec_id"), qv(id), th, 10)
      .select("id").as[Long].collect().toSet)
    val asym = recallOf(id => BinaryQuantizer.searchAsymmetric(
        encoded, col("vec_id"), qv(id), lo64, hi64, 10)
      .select("id").as[Long].collect().toSet)
    assert(asym > ham, s"asymmetric ($asym) should beat hamming ($ham)")
    // constant dimension: both sides of a degenerate dim fall back to the
    // threshold instead of NaN/null
    val const = spark.range(4).selectExpr("array(cast(1.5 as float), cast(id as float)) as v")
    val (l2, h2) = BinaryQuantizer.fitLevels(const, col("v"), 2, Array(1.5, 1.5))
    assert(l2(0) == 1.5 && h2(0) == 1.5) // no values above 1.5 at dim 0
  }

  test("SqReconDistance loop node == the literal chain, bit-for-bit (L2 and dot)") {
    // the chain is the independent oracle for the one-node rewrite (the
    // rewrite exists to collapse Catalyst tree walks, never to change a
    // bit): random codes, a degenerate hi<=lo dimension, a too-short
    // array (both must null), and a null array (both must null)
    import graft.operators.ScalarQuantizer
    val rnd = new scala.util.Random(7)
    val dim = 64
    val lo = Array.fill(dim)(rnd.nextDouble() - 0.5)
    val hi = lo.map(_ + rnd.nextDouble())
    hi(13) = lo(13) - 0.1 // degenerate dimension: step 0 by the shared guard
    val q = Array.fill(dim)(rnd.nextFloat()).toSeq
    val rows: Seq[Option[Seq[Long]]] =
      (0 until 500).map(_ => Some(Seq.fill(dim)(rnd.nextInt(256).toLong))) ++
        Seq(Some(Seq.fill(dim - 3)(1L)), None)
    val df = rows.toDF("codes")
    for (dot <- Seq(false, true)) {
      val (loop, chain) =
        if (dot) (ScalarQuantizer.approxDotDistance(col("codes"), q, lo, hi),
          ScalarQuantizer.approxDotDistanceChain(col("codes"), q, lo, hi))
        else (ScalarQuantizer.approxDistance(col("codes"), q, lo, hi),
          ScalarQuantizer.approxDistanceChain(col("codes"), q, lo, hi))
      val got = df.select(loop.as("a"), chain.as("b")).collect()
      got.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"null drift: $r")
        if (!r.isNullAt(0))
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"bit drift: $r")
      }
      assert(got.count(_.isNullAt(0)) == 2, "short + null rows must both null")
    }
  }

  test("BitLevelDistance loop node == the CASE chain, bit-for-bit (valid packed rows)") {
    // valid = encoder-shaped rows (exactly ceil(dim/64) non-null words);
    // dim=100 exercises cross-word bit addressing
    val rnd = new scala.util.Random(11)
    for (dim <- Seq(64, 100)) {
      val words = (dim + 63) / 64
      val lo = Array.fill(dim)(rnd.nextDouble() - 1.0)
      val hi = lo.map(_ + rnd.nextDouble() + 0.1)
      val q = Array.fill(dim)(rnd.nextFloat()).toSeq
      val rows = (0 until 300).map(_ => Seq.fill(words)(rnd.nextLong()))
      val df = rows.toDF("packed")
      val got = df.select(
        BinaryQuantizer.asymmetricDistance(col("packed"), q, lo, hi).as("a"),
        BinaryQuantizer.asymmetricDistanceChain(col("packed"), q, lo, hi).as("b"))
        .collect()
      got.foreach { r =>
        assert(!r.isNullAt(0) && !r.isNullAt(1))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"bit drift: $r")
      }
    }
  }
}
