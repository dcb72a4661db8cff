package graft

import org.apache.spark.sql.functions._
import graft.engine.{Collection, Search}
import graft.model._
import graft.model.IndexKind._

/** Dotted property paths resolve through struct columns (reference
  * models/index.go:115–151; fixture shape from shard_vector_test.go:40).
  */
class NestedSpec extends SparkSuite {
  import spark.implicits._

  lazy val coll: Collection = {
    val df = (0 until 50).map { i =>
      (i.toString, (Array(i.toFloat, i.toFloat), i.toLong))
    }.toDF("_id", "nested")
      .withColumn("nested", col("nested").cast("struct<vector:array<float>,size:bigint>"))
    Collection(df, IndexSchema(
      "nested.vector" -> VectorFlat(2, Metric.Euclidean),
      "nested.size" -> Integer))
  }

  test("near on a nested vector property") {
    val rows = Search.search(coll, SearchRequest(
      Query("nested.vector", vectorFlat = Some(VectorFlatOpts(Seq(10f, 10f), Op.Near, 3))),
      limit = 10)).collect()
    // ids 9 and 11 tie at distance 2; the string-id tie-break puts "11" first
    assert(rows.map(_.getAs[String]("_id")).toSeq == Seq("10", "11", "9"))
  }

  test("filter on a nested integer property with nested pre-filter") {
    val rows = Search.search(coll, SearchRequest(
      Query("nested.vector", vectorFlat = Some(VectorFlatOpts(Seq(10f, 10f), Op.Near, 3,
        filter = Some(Query("nested.size", integer = Some(IntegerOpts(12, Op.GreaterOrEq))))))),
      limit = 10)).collect()
    assert(rows.map(_.getAs[String]("_id")).toSeq == Seq("12", "13", "14"))
  }

  test("select of a dotted path re-nests into a struct") {
    val df = Search.search(coll, SearchRequest(
      Query("nested.size", integer = Some(IntegerOpts(5, Op.LessThan))),
      select = Seq("nested.size"), limit = 10))
    val field = df.schema("nested").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(field.fieldNames.toSeq == Seq("size"))
    assert(df.collect().map(_.getAs[org.apache.spark.sql.Row]("nested").getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("deep and overlapping select paths re-nest correctly") {
    import org.apache.spark.sql.types.StructType
    val df3 = Seq(("x", ((1L, 2L), 3L)))
      .toDF("_id", "a")
      .withColumn("a", col("a").cast("struct<b:struct<c:bigint,d:bigint>,e:bigint>"))
    val c3 = Collection(df3, IndexSchema("a.e" -> Integer))
    // depth-3 path a.b.c comes back as a{b{c}}
    val deep = Search.search(c3, SearchRequest(
      Query("a.e", integer = Some(IntegerOpts(3, Op.Equals))),
      select = Seq("a.b.c"), limit = 10))
    val aType = deep.schema("a").dataType.asInstanceOf[StructType]
    assert(aType.fieldNames.toSeq == Seq("b"))
    assert(aType("b").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("c"))
    assert(deep.head().getAs[org.apache.spark.sql.Row]("a").getStruct(0).getLong(0) == 1L)
    // selecting the whole struct plus one of its fields returns the struct
    val whole = Search.search(c3, SearchRequest(
      Query("a.e", integer = Some(IntegerOpts(3, Op.Equals))),
      select = Seq("a", "a.b.c"), limit = 10))
    assert(whole.schema("a").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("b", "e"))
  }

  test("schema validation rejects unknown nested paths") {
    intercept[IllegalArgumentException] {
      Search.search(coll, SearchRequest(
        Query("nested.nope", integer = Some(IntegerOpts(1, Op.Equals))), limit = 10))
    }
  }
}
