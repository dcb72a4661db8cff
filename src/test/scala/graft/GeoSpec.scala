package graft

import org.apache.spark.sql.functions._
import graft.functions.Geohash
import graft.engine.{Collection, Search}
import graft.model._
import graft.model.IndexKind._

/** Geo parity: geohash encoding against published test vectors, and the
  * reference's composite geo query shape — geohash-prefix pre-filter +
  * haversine `near`.
  */
class GeoSpec extends SparkSuite {
  import spark.implicits._

  test("geohash matches well-known test vectors") {
    // canonical examples from the geohash literature
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geohash.encode(42.6, -5.6, 5) == "ezs42")
    assert(Geohash.encode(0.0, 0.0, 6) == "s00000")
    assert(Geohash.encode(-25.382708, -49.265506, 8) == "6gkzwgjz")
  }

  test("geohash expression works on columns") {
    val df = Seq(
      ("a", Array(57.64911f, 10.40744f)),
      ("b", Array(42.6f, -5.6f))
    ).toDF("_id", "geo")
    val got = df.select(col("_id"), Geohash(col("geo"), 5).as("gh"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a") == "u4pru")
    assert(got("b") == "ezs42")
  }

  test("geo search: geohash-prefix pre-filter + haversine near") {
    // cities with [lat, lon]; geohash stored as a string property
    val cities = Seq(
      ("london", Array(51.5074f, -0.1278f)),
      ("paris", Array(48.8566f, 2.3522f)),
      ("berlin", Array(52.52f, 13.405f)),
      ("madrid", Array(40.4168f, -3.7038f)),
      ("rome", Array(41.9028f, 12.4964f)),
      ("dublin", Array(53.3498f, -6.2603f))
    ).toDF("_id", "geo")
    val coll = Collection(
      cities.withColumn("gh", Geohash(col("geo"), 6)),
      IndexSchema(
        "geo" -> VectorFlat(2, Metric.Haversine),
        "gh" -> Str(caseSensitive = true)))
    // gc-prefix of "gc" covers Britain/Ireland; near ranks by distance to London
    val rows = Search.search(coll, SearchRequest(
      Query("geo", vectorFlat = Some(VectorFlatOpts(
        Seq(51.5074f, -0.1278f), Op.Near, 5,
        filter = Some(Query("gh", string = Some(StringOpts("gc", Op.StartsWith))))))),
      limit = 10)).collect()
    assert(rows.map(_.getAs[String]("_id")).toSeq == Seq("london", "dublin"))
    assert(rows.head.getAs[Float]("_distance") < 1.0f) // self-distance ~0 m
  }
}
