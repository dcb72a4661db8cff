package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Laws for the bounded per-group top-k: hand fixture with ties, exact
  * equivalence with the row_number window on real data, k larger than the
  * group, smallest-k mode, layout independence, and guards.
  */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private def toy = Seq(
    ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
    ("b", 5L, 2.0),
    ("c", 6L, 0.0), ("c", 7L, -3.0))
    .toDF("src", "id", "score")

  test("hand fixture: score desc, id tiebreak, rank 1-based") {
    val out = Curation.topKPerGroup(toy, $"src", $"id", $"score", 2)
      .orderBy("group", "rank")
      .as[(String, Long, Double, Int)].collect().toSeq
    assert(out === Seq(
      ("a", 2L, 9.0, 1), ("a", 3L, 9.0, 2),
      ("b", 5L, 2.0, 1),
      ("c", 6L, 0.0, 1), ("c", 7L, -3.0, 2)))
  }

  test("zero scores surface as +0.0 (hash-stable), not -0.0") {
    val out = Curation.topKPerGroup(toy, $"src", $"id", $"score", 1)
      .filter($"group" === "c").select("score").as[Double].head()
    assert(java.lang.Double.doubleToLongBits(out) ===
      java.lang.Double.doubleToLongBits(0.0))
  }

  test("matches row_number window selection on documents (n_chars desc)") {
    val d = Tables.documents(spark, sf001)
    val ours = Curation.topKPerGroup(d, $"source", $"doc_id",
        $"n_chars".cast("double"), 7)
      .select($"group".as("source"), $"id", $"score", $"rank")
    val w = Window.partitionBy($"source").orderBy($"n_chars".desc, $"doc_id".asc)
    val ref = d.select($"source", $"doc_id".as("id"),
        $"n_chars".cast("double").as("score"),
        row_number().over(w).as("rank"))
      .filter($"rank" <= 7)
    assert(ours.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(ours).count() === 0)
    assert(ours.count() > 0)
  }

  test("k beyond group size returns the whole group, ranked") {
    val out = Curation.topKPerGroup(toy, $"src", $"id", $"score", 100)
    assert(out.count() === 7)
    assert(out.filter($"group" === "a").agg(max("rank")).as[Int].head() === 4)
  }

  test("smallest-k mode inverts the order, same tiebreak") {
    val out = Curation.topKPerGroup(toy, $"src", $"id", $"score", 1, largest = false)
      .orderBy("group").as[(String, Long, Double, Int)].collect().toSeq
    assert(out === Seq(("a", 4L, 1.0, 1), ("b", 5L, 2.0, 1), ("c", 7L, -3.0, 1)))
  }

  test("layout independence: identical selection under repartition") {
    val d = Tables.documents(spark, sf001)
    val a = Curation.topKPerGroup(d, $"source", $"doc_id", $"n_chars".cast("double"), 5)
    val b = Curation.topKPerGroup(d.repartition(17, $"lang"), $"source", $"doc_id",
      $"n_chars".cast("double"), 5)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("mmr: lambda=1 reduces to top-k by relevance") {
    val cands = Seq(
      (1L, 0.9, Seq(1.0, 0.0)), (2L, 0.8, Seq(1.0, 0.01)),
      (3L, 0.7, Seq(0.0, 1.0)), (4L, 0.6, Seq(0.5, 0.5)))
      .toDF("id", "rel", "v")
    val out = Curation.mmr(cands, $"id", $"rel", $"v", k = 3, lambda = 1.0)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(out === Seq(1L, 2L, 3L))
  }

  test("mmr: diversity beats the duplicate cluster") {
    // ids 1,2 are near-duplicates with the best scores; 3 is distinct.
    // plain top-2 = {1,2}; MMR at λ=0.5 must pick {1,3}.
    val cands = Seq(
      (1L, 0.95, Seq(1.0, 0.0)), (2L, 0.94, Seq(0.999, 0.001)),
      (3L, 0.60, Seq(0.0, 1.0)))
      .toDF("id", "rel", "v")
    val out = Curation.mmr(cands, $"id", $"rel", $"v", k = 2, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(out === Seq(1L, 3L))
  }

  test("mmr: deterministic under layout; candidate cap enforced") {
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", (lit(0.0) - $"vec_id" % 97).as("rel"), $"embedding")
      .limit(60)
    val a = Curation.mmr(e, $"vec_id", $"rel", $"embedding", 10, 0.7)
      .as[(Long, Int, Double)].collect().toSeq
    val b = Curation.mmr(e.repartition(7), $"vec_id", $"rel", $"embedding", 10, 0.7)
      .as[(Long, Int, Double)].collect().toSeq
    assert(a === b)
    assert(a.map(_._2) === (1 to 10))
    intercept[IllegalArgumentException](
      Curation.mmr(e, $"vec_id", $"rel", $"embedding", 5, 0.5, maxCandidates = 10))
  }

  test("rrf: hand-computed fusion, overlap outranks single-list hits") {
    val l1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val l2 = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val out = Curation.rrfFuse(Seq(l1, l2), k = 60)
      .as[(Long, Double, Int)].collect().toSeq
    val expected = Map(
      10L -> 1.0 / 61, 20L -> (1.0 / 62 + 1.0 / 61),
      30L -> 1.0 / 63, 40L -> 1.0 / 62)
    out.foreach { case (id, s, n) =>
      assert(math.abs(s - expected(id)) < 1e-15, s"id $id")
      assert(n === (if (id == 20L) 2 else 1))
    }
    // the doubly-ranked id wins despite rank 2 in one list
    assert(out.head._1 === 20L)
  }

  test("rrf: single list preserves its order; guards") {
    val l = Seq((5L, 1L), (6L, 2L)).toDF("id", "rank")
    val out = Curation.rrfFuse(Seq(l)).select("id").as[Long].collect().toSeq
    assert(out === Seq(5L, 6L))
    intercept[IllegalArgumentException](Curation.rrfFuse(Seq.empty))
    intercept[IllegalArgumentException](Curation.rrfFuse(Seq(l), k = -1))
  }

  test("guards: k must be positive, id must be numeric") {
    intercept[IllegalArgumentException](
      Curation.topKPerGroup(toy, $"src", $"id", $"score", 0))
    val strId = toy.withColumn("sid", concat(lit("x"), $"id"))
    intercept[IllegalArgumentException](
      Curation.topKPerGroup(strId, $"src", $"sid", $"score", 1))
  }

  test("mmr: NaN relevance / NaN vectors are excluded, never poison the argmax") {
    val cands = Seq(
      (1L, 0.9, Seq(1.0f, 0.0f)),
      (2L, Double.NaN, Seq(0.0f, 1.0f)),        // NaN rel
      (3L, 0.5, Seq(Float.NaN, 1.0f)),          // NaN vector component
      (4L, 0.4, Seq(0.0f, 1.0f))
    ).toDF("id", "rel", "vec")
    val out = Curation.mmr(cands, $"id", $"rel", $"vec", k = 4, lambda = 0.5)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L, 4L), out) // NaN rows dropped, no AIOOBE(-1)
    // all-NaN input degrades to empty, not a crash
    val allNan = Seq((9L, Double.NaN, Seq(1.0f))).toDF("id", "rel", "vec")
    assert(Curation.mmr(allNan, $"id", $"rel", $"vec", k = 1, lambda = 0.5).count() == 0)
  }

  test("rrf: duplicate ids inside one list collapse to best rank, no fan-out") {
    val dup = Seq((10L, 3L), (10L, 1L), (20L, 2L)).toDF("id", "rank")
    val l2 = Seq((10L, 1L), (30L, 2L)).toDF("id", "rank")
    val out = Curation.rrfFuse(Seq(dup, l2), k = 60)
      .as[(Long, Double, Int)].collect().map { case (id, s, n) => id -> (s, n) }.toMap
    // id 10: min-rank 1 from the dup list + rank 1 from l2 - counted ONCE each
    assert(math.abs(out(10L)._1 - (1.0 / 61 + 1.0 / 61)) < 1e-15, out(10L))
    assert(out(10L)._2 == 2)
    assert(out(20L)._2 == 1 && out(30L)._2 == 1)
  }
}
