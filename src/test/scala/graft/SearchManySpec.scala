package graft

import org.apache.spark.sql.functions._
import graft.engine.Search
import graft.model._

/** Laws for the batch-amortized serving face (round-11 verdict item #4):
  * Search.searchMany must be REQUEST-FOR-REQUEST identical to K
  * independent Search.search calls — the batch is a cost optimization
  * (one hop-fused walk wave + one fused gid→id lookup per group), never a
  * semantics change — across batchable requests, non-batchable fallbacks,
  * and mixed batches.
  */
class SearchManySpec extends SparkSuite {

  lazy val coll = queries.TestCollections.docsVamana(spark, sf0001)

  private def vamanaReq(qi: Long, limit: Int = 10, weight: Float = 1.5f,
      searchSize: Int = 75, filter: Option[Query] = None) = SearchRequest(
    Query("vec_l2", vectorVamana = Some(VectorVamanaOpts(
      queries.TestCollections.queryVector(spark, sf0001, qi), Op.Near,
      searchSize = searchSize, limit = limit, weight = Some(weight),
      approx = true, filter = filter))),
    limit = 100)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("_id"), col("_distance").cast("string"),
      col("_hybridScore").cast("string"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("searchMany == K independent searches (uniform batchable batch)") {
    val reqs = (0L to 4L).map(vamanaReq(_))
    val batch = Search.searchMany(coll, reqs)
    assert(batch.size == reqs.size)
    reqs.zip(batch).foreach { case (r, df) =>
      assert(rows(df) == rows(Search.search(coll, r)), s"drift for $r")
    }
  }

  test("searchMany == K independent searches (mixed limits/weights → distinct budget groups)") {
    // limit 40 forces budget max(75, 80) = 80 ≠ 75: two walk groups
    val reqs = Seq(vamanaReq(0L), vamanaReq(1L, limit = 40, weight = 2.0f),
      vamanaReq(2L, searchSize = 60))
    val batch = Search.searchMany(coll, reqs)
    reqs.zip(batch).foreach { case (r, df) =>
      assert(rows(df) == rows(Search.search(coll, r)))
    }
  }

  test("non-batchable requests fall back to the single pipeline unchanged") {
    val filtered = vamanaReq(3L, filter = Some(Query("lang",
      string = Some(StringOpts("en", Op.Equals)))))
    val plain = SearchRequest(
      Query("lang", string = Some(StringOpts("en", Op.Equals))), limit = 7)
    val reqs = Seq(filtered, vamanaReq(4L), plain)
    val batch = Search.searchMany(coll, reqs)
    reqs.zip(batch).foreach { case (r, df) =>
      assert(rows(df) == rows(Search.search(coll, r)))
    }
  }

  test("searchManyJson parses like the single JSON face") {
    val q0 = queries.TestCollections.queryVector(spark, sf0001, 0L)
    val body =
      s"""{"query":{"property":"vec_l2","vectorVamana":{
         |"vector":[${q0.mkString(",")}],"operator":"near",
         |"searchSize":75,"limit":10,"approx":true}},"limit":100}""".stripMargin
    val fromJson = Search.searchManyJson(coll, Seq(body, body))
    val single = Search.searchJson(coll, body)
    fromJson.foreach(df => assert(rows(df) == rows(single)))
  }

  // SQ8-quantized flat collection: the flat batchable family's
  // representative (same artifact the s2_near_sq_approx gate serves)
  lazy val flatColl = queries.TestCollections.docsSq8(spark, sf0001)

  private def flatReq(qi: Long, limit: Int = 10, weight: Option[Float] = None,
      filter: Option[Query] = None) = SearchRequest(
    Query("embedding", vectorFlat = Some(VectorFlatOpts(
      queries.TestCollections.queryVector(spark, sf0001, qi), Op.Near,
      limit, weight = weight, approx = true, filter = filter))),
    limit = 100)

  test("flat searchMany == K independent searches (fused SQ8 candidate scan)") {
    val reqs = (0L to 4L).map(flatReq(_))
    val batch = Search.searchMany(flatColl, reqs)
    assert(batch.size == reqs.size)
    reqs.zip(batch).foreach { case (r, df) =>
      assert(rows(df) == rows(Search.search(flatColl, r)), s"flat drift for $r")
    }
  }

  test("flat searchMany: mixed limits/weights and filtered fallback") {
    // limit 20 forces budget max(5*20, 50) = 100 ≠ 50: two scan groups;
    // the filtered request must take the single pipeline unchanged
    val reqs = Seq(
      flatReq(0L), flatReq(1L, limit = 20, weight = Some(2.0f)),
      flatReq(2L, filter = Some(Query("lang",
        string = Some(StringOpts("en", Op.Equals))))))
    val batch = Search.searchMany(flatColl, reqs)
    reqs.zip(batch).foreach { case (r, df) =>
      assert(rows(df) == rows(Search.search(flatColl, r)))
    }
  }

  test("empty batch and invalid request behave like the single face") {
    assert(Search.searchMany(coll, Nil).isEmpty)
    val bad = SearchRequest(
      Query("vec_l2", vectorVamana = Some(VectorVamanaOpts(
        Seq(1.0f), Op.Near, searchSize = 75, limit = 0, approx = true))))
    intercept[IllegalArgumentException](Search.searchMany(coll, Seq(bad)))
  }
}
