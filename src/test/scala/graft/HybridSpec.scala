package graft

import org.apache.spark.sql.functions._
import graft.engine.{Collection, Search}
import graft.functions.TextAnalyzer
import graft.model._
import graft.model.IndexKind._

/** Hybrid merge laws (reference shard/index/search.go:243–298) and the
  * text analyzer/tf-idf path on a hand-computable fixture.
  */
class HybridSpec extends SparkSuite {
  import spark.implicits._

  // 4 docs; flat 2-d vectors; countable term stats
  lazy val fixture: Collection = {
    val rows = Seq(
      ("0", Array(0f, 0f), "apple banana apple"),
      ("1", Array(1f, 0f), "banana cherry"),
      ("2", Array(2f, 0f), "apple cherry date"),
      ("3", Array(3f, 0f), "date elderberry the a of"))
    Collection(rows.toDF("_id", "vec", "body"), IndexSchema(
      "vec" -> VectorFlat(2, Metric.Euclidean),
      "body" -> Text()))
  }

  test("analyzer: lowercase, punctuation split, stopwords out, dups kept") {
    assert(TextAnalyzer.analyzeString("The QUICK, quick brown-fox!") ==
      Seq("quick", "quick", "brown", "fox"))
    assert(TextAnalyzer.analyzeString("a the of") == Nil)
  }

  test("tf-idf matches hand computation") {
    // query "apple": df=2, numDocs=4, idf=log10(4/3)
    // doc0: tf=2/3 (stopword-free len 3); doc2: tf=1/3
    val rows = Search.search(fixture, SearchRequest(
      Query("body", text = Some(TextOpts("apple", Op.ContainsAny, 10))), limit = 10)).collect()
    val idf = math.log10(4.0 / 3.0)
    val byId = rows.map(r => r.getAs[String]("_id") -> r.getAs[Float]("_score")).toMap
    assert(byId.keySet == Set("0", "2"))
    assert(math.abs(byId("0") - (2.0 / 3.0 * idf)) < 1e-6)
    assert(math.abs(byId("2") - (1.0 / 3.0 * idf)) < 1e-6)
    // doc0 ranks first
    assert(rows.head.getAs[String]("_id") == "0")
  }

  test("containsAll requires every term") {
    val rows = Search.search(fixture, SearchRequest(
      Query("body", text = Some(TextOpts("apple cherry", Op.ContainsAll, 10))), limit = 10)).collect()
    assert(rows.map(_.getAs[String]("_id")).toSeq == Seq("2"))
  }

  test("stopword-only doc terms don't match; doc length excludes stopwords") {
    val rows = Search.search(fixture, SearchRequest(
      Query("body", text = Some(TextOpts("date", Op.ContainsAny, 10))), limit = 10)).collect()
    // doc3 analyzed length is 2 (date, elderberry) → tf = 1/2
    val d3 = rows.find(_.getAs[String]("_id") == "3").get
    val idf = math.log10(4.0 / 3.0)
    assert(math.abs(d3.getAs[Float]("_score") - 0.5 * idf) < 1e-6)
  }

  test("_and of ranked + predicate post-filters the ranked list") {
    // vector near [0,0] top-3 = ids 0,1,2; AND body containsAny cherry (ids 1,2)
    val rows = Search.search(fixture, SearchRequest(
      Query("_and", and = Seq(
        Query("vec", vectorFlat = Some(VectorFlatOpts(Seq(0f, 0f), Op.Near, 3, weight = Some(1.0f)))),
        Query("body", text = Some(TextOpts("cherry", Op.ContainsAny, 10, weight = Some(0.0f)))))),
      limit = 10)).collect()
    assert(rows.map(_.getAs[String]("_id")).sorted.toSeq == Seq("1", "2"))
    // hybrid = -dist + 0*score; distances 1 and 4
    val byId = rows.map(r => r.getAs[String]("_id") -> r.getAs[Float]("_hybridScore")).toMap
    assert(byId("1") == -1.0f && byId("2") == -4.0f)
  }

  test("_or sums hybrid scores of duplicates and keeps first non-null fields") {
    val rows = Search.search(fixture, SearchRequest(
      Query("_or", or = Seq(
        Query("vec", vectorFlat = Some(VectorFlatOpts(Seq(0f, 0f), Op.Near, 2, weight = Some(1.0f)))),
        Query("body", text = Some(TextOpts("banana", Op.ContainsAny, 10, weight = Some(10.0f)))))),
      limit = 10)).collect()
    // vector top2: 0 (d=0), 1 (d=1); text matches 0 and 1 (banana df=2)
    val byId = rows.map(r => r.getAs[String]("_id") -> r).toMap
    assert(byId.keySet == Set("0", "1"))
    val idf = math.log10(4.0 / 3.0).toFloat
    // doc0: -0 + 10*(1/3)*idf ; doc1: -1 + 10*(1/2)*idf
    assert(math.abs(byId("0").getAs[Float]("_hybridScore") - 10f * (1f / 3f) * idf) < 1e-5)
    assert(math.abs(byId("1").getAs[Float]("_hybridScore") - (-1f + 10f * 0.5f * idf)) < 1e-5)
    // both distance and score populated on duplicates
    assert(byId("0").getAs[Float]("_distance") == 0.0f)
    assert(byId("0").getAs[Float]("_score") > 0f)
  }

  test("_or with set-only child appends unranked rows with hybrid 0") {
    val rows = Search.search(fixture, SearchRequest(
      Query("_or", or = Seq(
        Query("vec", vectorFlat = Some(VectorFlatOpts(Seq(0f, 0f), Op.Near, 1))),
        Query("body", text = Some(TextOpts("elderberry", Op.ContainsAny, 10, weight = Some(0.0f)))))),
      limit = 10)).collect()
    val byId = rows.map(r => r.getAs[String]("_id") -> r.getAs[Float]("_hybridScore")).toMap
    assert(byId.keySet == Set("0", "3"))
    assert(byId("0") == 0.0f) // -1*0 distance
    assert(byId("3") == 0.0f) // 0-weighted text
  }

  test("kitchen-sink JSON query end-to-end (docs/search/kitchen.md shape)") {
    val json =
      """{"query": {"property": "_or", "_or": [
        |  {"property": "vec", "vectorFlat": {
        |     "vector": [0, 0], "operator": "near", "limit": 2,
        |     "filter": {"property": "_and", "_and": [
        |        {"property": "body", "text": {"value": "apple", "operator": "containsAny", "limit": 10}}]},
        |     "weight": 0.3}},
        |  {"property": "_and", "_and": [
        |     {"property": "body", "text": {"value": "cherry", "operator": "containsAll", "limit": 10, "weight": 0.7}},
        |     {"property": "vec", "vectorFlat": {"vector": [2, 0], "operator": "near", "limit": 3}}]}]},
        | "select": ["body"], "sort": [{"property": "_hybridScore", "descending": true}], "limit": 5}""".stripMargin
    // smoke: parses, runs, respects limit; sort on metadata column works
    val df = Search.searchJson(fixture, json)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(df.columns.contains("body"))
  }

  test("analyzer: bleve UAX#29 apostrophe fidelity on a contraction corpus") {
    // expected output derived from bleve's standard analyzer (unicode
    // tokenizer + to_lower + stop_en, reference shard/index/text/text.go:
    // 69-96): mid-word apostrophes keep tokens whole, leading/trailing
    // apostrophes strip, contraction STOPWORDS ("don't", "it's") drop
    val text = "Don't stop believin' \u2014 it's Mary's 3'5 O'Brien rock'n'roll"
    val expected = Seq("stop", "believin", "mary's", "3'5", "o'brien", "rock'n'roll")
    assert(TextAnalyzer.analyzeString(text) == expected)
    // the Column path agrees with the driver path term for term
    val viaCol = Seq(text).toDF("t")
      .select(TextAnalyzer.analyze(col("t")).as("terms"))
      .as[Seq[String]].head()
    assert(viaCol == expected)
    // the curly apostrophe variant stays whole but is NOT the ASCII
    // stopword - bleve's stop_en is ASCII-only, so "don\u2019t" survives
    assert(TextAnalyzer.analyzeString("don\u2019t worry") == Seq("don\u2019t", "worry"))
  }

  test("analyzer: Column path == driver path over generated apostrophe-heavy strings") {
    // deterministic corpus sweeping the tokenizer's edge shapes: the
    // engine indexes with the Column path and parses queries with the
    // driver path - any divergence silently empties search results
    val pieces = Seq("don't", "O'Brien", "3'5", "it's", "'leading", "trailing'",
      "rock'n'roll", "a''b", "don\u2019t", "x", "42", "caf\u00e9", "-", "''", "I'M")
    val rng = new scala.util.Random(7)
    val corpus = (0 until 40).map { _ =>
      (0 until (1 + rng.nextInt(8))).map(_ => pieces(rng.nextInt(pieces.size)))
        .mkString(Seq(" ", ", ", "! ", " \u2014 ")(rng.nextInt(4)))
    }
    val viaCol = corpus.toDF("t")
      .select(TextAnalyzer.analyze(col("t")).as("terms"))
      .as[Seq[String]].collect().toSeq
    corpus.zip(viaCol).foreach { case (text, colTerms) =>
      assert(TextAnalyzer.analyzeString(text) == colTerms, s"diverged on: $text")
    }
  }
}
