package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Hand-computed fixtures for the as-of join: inclusive match, tiebreak
  * at equal timestamps, the no-preceding-right null case, microsecond
  * timestamp fidelity through the carry (the round-5 JSON round-trip
  * silently truncated sub-millisecond precision), and the input guards.
  */
class TemporalSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // right: user 1 has clicks at 10:00:00.000001 (id 1, v 1.0),
  // 10:00:00.000003 (ids 2 & 3 — tiebreak: 3 wins, v 3.0), 10:00:10 (id 4);
  // user 2 has none
  private def right = Seq(
    (1L, ts("2024-01-01 10:00:00.000001"), 1L, 1.0),
    (1L, ts("2024-01-01 10:00:00.000003"), 2L, 2.0),
    (1L, ts("2024-01-01 10:00:00.000003"), 3L, 3.0),
    (1L, ts("2024-01-01 10:00:10.0"), 4L, 4.0))
    .toDF("user", "ts", "rid", "rv")

  // left: before any right (null), exactly AT .000003 (inclusive + tiebreak),
  // between .000003 and 10s (carries id 3), after 10s (carries id 4), and a
  // user with no right rows at all
  private def left = Seq(
    (10L, 1L, ts("2024-01-01 10:00:00.0")),
    (11L, 1L, ts("2024-01-01 10:00:00.000003")),
    (12L, 1L, ts("2024-01-01 10:00:05.0")),
    (13L, 1L, ts("2024-01-01 10:00:30.0")),
    (14L, 2L, ts("2024-01-01 10:00:30.0")))
    .toDF("lid", "user", "ts")

  test("asofJoin: inclusive match, equal-ts tiebreak, null backfill") {
    val out = Temporal.asofJoin(left, right, "user", "ts", "rid", Seq("rid", "rv"))
      .select("lid", "asof_rid", "asof_rv").orderBy("lid")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(out.toSeq == Seq(
      (10L, -1L, -1.0),  // 10:00:00.0 precedes the first click by 1µs
      (11L, 3L, 3.0),    // inclusive at .000003; id 3 beats id 2
      (12L, 3L, 3.0),
      (13L, 4L, 4.0),
      (14L, -1L, -1.0))) // user 2 has no right rows
  }

  test("asofJoin carries microsecond timestamps and left columns losslessly") {
    val out = Temporal.asofJoin(left, right, "user", "ts", "rid", Seq("rv"))
      .orderBy("lid").collect()
    // left ts survives to the microsecond (row 10 = 10:00:00.0 exactly;
    // row 11 = .000003) and asof_ts is the matched right row's event time
    assert(out(1).getTimestamp(2) == ts("2024-01-01 10:00:00.000003"))
    assert(out(1).getTimestamp(3) == ts("2024-01-01 10:00:00.000003"))
    assert(out(0).getTimestamp(2) == ts("2024-01-01 10:00:00.0"))
    assert(out(0).isNullAt(3)) // no match → null asof_ts
    // output columns: left's own, then prefix ts + payload
    assert(out(0).schema.fieldNames.toSeq ==
      Seq("lid", "user", "ts", "asof_ts", "asof_rv"))
  }

  test("asofJoin rejects a payload containing ts and non-numeric tiebreaks") {
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, right, "user", "ts", "rid", Seq("ts", "rv"))
    }
    val badTb = right.withColumn("rid", col("rid").cast("string"))
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, badTb, "user", "ts", "rid", Seq("rv"))
    }
  }

  test("asofJoin equals the brute-force reference on randomized event sets") {
    val rnd = new scala.util.Random(42)
    def t(): Timestamp = new Timestamp(
      1700000000000L + rnd.nextInt(100000).toLong * 1000L + rnd.nextInt(1000))
    for (round <- 1 to 5) {
      // rid is unique per right row — the realistic tiebreak (an event id),
      // which is also the operator's determinism contract at equal ts
      val rights = (0 until 60).map(i => (rnd.nextInt(4).toLong, t(), i.toLong, rnd.nextDouble()))
      val lefts = (0 until 80).map(i => (1000L + i, rnd.nextInt(4).toLong, t()))
      val out = Temporal.asofJoin(
          lefts.toDF("lid", "user", "ts"), rights.toDF("user", "ts", "rid", "rv"),
          "user", "ts", "rid", Seq("rid", "rv"))
        .select("lid", "asof_rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val expect = lefts.map { case (lid, u, lts) =>
        val cands = rights.filter(r => r._1 == u && !r._2.after(lts))
        lid -> (if (cands.isEmpty) -1L
                else cands.maxBy(r => (r._2.getTime, r._3))._3)
      }.toMap
      assert(out == expect, s"randomized round $round diverged from brute force")
    }
  }

  test("asofJoin result is partition-layout independent") {
    val a = Temporal.asofJoin(left.repartition(7), right.repartition(5),
        "user", "ts", "rid", Seq("rid", "rv"))
      .select("lid", "asof_rid").orderBy("lid").collect().toSeq
    val b = Temporal.asofJoin(left.coalesce(1), right.coalesce(1),
        "user", "ts", "rid", Seq("rid", "rv"))
      .select("lid", "asof_rid").orderBy("lid").collect().toSeq
    assert(a == b)
  }
}
