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

  test("guards: k must be positive, id must be numeric") {
    intercept[IllegalArgumentException](
      Curation.topKPerGroup(toy, $"src", $"id", $"score", 0))
    val strId = toy.withColumn("sid", concat(lit("x"), $"id"))
    intercept[IllegalArgumentException](
      Curation.topKPerGroup(strId, $"src", $"sid", $"score", 1))
  }
}
