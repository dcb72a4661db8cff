package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Laws for the bucketized point-in-interval join: brute-force
  * equivalence on random data across bucket widths (incl. negative
  * values straddling bucket 0), inclusive bounds, no duplicate pairs,
  * plan shape (equi-join, never BroadcastNestedLoop), the explode-bomb
  * guard, and inverted/null inputs.
  */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def brute(ps: Seq[(Long, Long)], is: Seq[(Long, Long, Long)]) =
    (for {
      (pid, v) <- ps; (iid, lo, hi) <- is
      if lo <= hi && v >= lo && v <= hi
    } yield (pid, iid, v, lo, hi)).toSet

  test("matches brute force on random data across bucket widths") {
    val rnd = new scala.util.Random(7)
    val ps = (1L to 400L).map(i => (i, rnd.nextLong() % 1000))
    val is = (1L to 120L).map { i =>
      val a = rnd.nextLong() % 1000; val b = a + rnd.nextInt(300)
      (i, a, b)
    }
    val pdf = ps.toDF("pid", "v"); val idf = is.toDF("iid", "lo", "hi")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(pdf, $"pid", $"v", idf, $"iid", $"lo", $"hi", w)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === brute(ps, is), s"width $w")
    }
  }

  test("bounds are inclusive on both ends; pairs are emitted exactly once") {
    val pdf = Seq((1L, 10L), (2L, 20L), (3L, 15L)).toDF("pid", "v")
    val idf = Seq((9L, 10L, 20L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pdf, $"pid", $"v", idf, $"iid", $"lo", $"hi", 3L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.size === 3 && out.distinct.size === 3)
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L))
  }

  test("plan is an equi-join on the bucket — no BroadcastNestedLoopJoin") {
    val pdf = Seq((1L, 10L)).toDF("pid", "v")
    val idf = Seq((9L, 0L, 100L)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(pdf, $"pid", $"v", idf, $"iid", $"lo", $"hi", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
  }

  test("outlier interval beyond maxBucketsPerInterval fails fast") {
    val pdf = Seq((1L, 10L)).toDF("pid", "v")
    val idf = Seq((9L, 0L, 10000000L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pdf, $"pid", $"v", idf, $"iid", $"lo", $"hi",
        1L, maxBucketsPerInterval = 100).collect()
    }
    assert(ex.getMessage.contains("maxBucketsPerInterval") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxBucketsPerInterval")))
  }

  test("inverted intervals and null values never match") {
    val pdf = Seq((1L, 10L), (2L, 0L)).toDF("pid", "v")
      .union(Seq((3L, null.asInstanceOf[java.lang.Long])).toDF("pid", "v"))
    val idf = Seq((9L, 20L, 10L)).toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(pdf, $"pid", $"v", idf, $"iid", $"lo", $"hi", 5L)
      .count() === 0)
  }

  test("guards: bucketWidth and cap must be positive") {
    val pdf = Seq((1L, 10L)).toDF("pid", "v")
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(pdf, $"pid", $"v", pdf, $"pid", $"v", $"v", 0L))
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(pdf, $"pid", $"v", pdf, $"pid", $"v", $"v", 5L, 0))
  }
}
