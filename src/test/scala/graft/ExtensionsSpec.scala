package graft

class ExtensionsSpec extends SparkSuite {

  test("vector_distance_* callable from plain SQL after registration") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf0001).createOrReplaceTempView("emb_ext")
    val row = spark.sql(
      """SELECT vec_id,
        |  vector_distance_cosine(embedding, embedding) AS c,
        |  vector_distance_euclidean(embedding, embedding) AS e,
        |  vector_distance_dot(embedding, embedding) AS d
        |FROM emb_ext WHERE vec_id = 0""".stripMargin).head()
    // self-distance: cosine ≈ 0 (normalized), euclidean = 0, dot ≈ -1
    assert(math.abs(row.getAs[Double]("c")) < 1e-5)
    assert(row.getAs[Double]("e") == 0.0)
    assert(math.abs(row.getAs[Double]("d") + 1.0) < 1e-5)
  }

  test("geohash callable from plain SQL (the geo story's SQL face)") {
    GraftExtensions.register(spark)
    val g = spark.sql(
      "SELECT geohash(array(CAST(57.64911 AS FLOAT), CAST(10.40744 AS FLOAT)), 9) AS g")
      .head().getAs[String]("g")
    // well-known vector, truncated to the 9 chars float32 input resolves
    assert(g == "u4pruydqq")
    // non-literal precision is a clear construction error, not task garbage
    val e = intercept[Exception] {
      spark.sql("SELECT geohash(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), vec_id) FROM emb_ext")
        .collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.contains("geohash"))
  }

  test("SQL double-array literals coerce to float arrays (no stride misread)") {
    GraftExtensions.register(spark)
    // array(3.0, 4.0) is array<double>; ImplicitCastInputTypes must insert
    // the float cast — without it getFloat reads 8-byte doubles with a
    // 4-byte stride and silently returns garbage
    val e = spark.sql(
      "SELECT vector_distance_euclidean(array(3.0, 4.0), array(0.0, 0.0)) AS e")
      .head().getAs[Double]("e")
    assert(e == 25.0, s"expected 25.0 (3²+4²), got $e")
    val h = spark.sql(
      "SELECT vector_distance_hamming(array(1.0, 0.0), array(0.0, 0.0)) AS h")
      .head().getAs[Double]("h")
    assert(h == 1.0)
  }

  test("withExtensions wires functions at session build time") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return the shared session; registration must hold
    val ok = s2.sql("SELECT vector_distance_hamming(array(1.0F, 0.0F), array(0.0F, 0.0F)) AS h")
      .head().getAs[Double]("h")
    assert(ok == 1.0)
  }

  test("cached docs collection reuses its text index across queries") {
    val c1 = graft.queries.TestCollections.docs(spark, sf0001)
    val c2 = graft.queries.TestCollections.docs(spark, sf0001)
    assert(c1 eq c2)
    assert(c1.textIndexes.contains("text"))
    assert(c1.textIndexes("text").numDocs == 500L)
  }
}
