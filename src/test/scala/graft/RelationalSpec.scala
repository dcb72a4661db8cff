package graft

import graft.queries.Relational

class RelationalSpec extends SparkSuite {

  test("q1_agg groups all six returnflag/linestatus combos") {
    val rows = Relational.q1Agg.build(spark, sf0001).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-12-01 00:00:00").cast("timestamp_ntz"))
      .count()
    assert(total == expected && total > 0)
  }

  test("q2_join_agg covers every nation exactly once") {
    val rows = Relational.q2JoinAgg.build(spark, sf0001).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[String]("n_name")).distinct.length == 25)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q3_window emits at most 3 rows per customer, rn in 1..3") {
    val rows = Relational.q3Window.build(spark, sf0001).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(byCust.values.forall(_.length <= 3))
    assert(rows.forall(r => r.getAs[Int]("rn") >= 1 && r.getAs[Int]("rn") <= 3))
    // within a customer, totalprice is non-increasing with rn
    byCust.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q4_events_window counts sum to the events row count") {
    val rows = Relational.q4EventsWindow.build(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 1000L)
  }

  test("q5_antijoin returns per-segment counts") {
    val rows = Relational.q5AntiJoin.build(spark, sf0001).collect()
    assert(rows.forall(_.getAs[Long]("n_inactive") > 0))
  }

  test("entry returns non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
