package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Temporal

/** Temporal-join queries over the events stream, oracled against DuckDB's
  * NATIVE ASOF JOIN — the strongest cross-check available: a different
  * engine's built-in implementation of the same semantic, not a SQL
  * re-derivation of ours.
  */
object TemporalQueries {

  /** For every `view` event, the most recent `click` by the same user at
    * or before it (inclusive), carrying the click's id and value — nulls
    * when no click precedes. The right side is pre-aggregated to one row
    * per (user, ts) (max event_id wins), so the match is deterministic by
    * construction in BOTH engines; the asofJoin tiebreak re-states the
    * same choice. Timestamps flow through the operator's native-struct
    * carry at full microsecond precision — this query is the regression
    * gate for the round-5 JSON-round-trip precision bug.
    */
  val q10AsofJoin = NamedQuery(
    "q10_asof_join",
    """WITH l AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'view'),
      |r AS (SELECT user_id, ts, max(event_id) AS click_id,
      |        max_by(value, event_id) AS click_value
      |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
      |SELECT l.event_id AS id, l.user_id, l.ts, l.value,
      |  r.ts AS asof_ts, r.click_id AS asof_click_id, r.click_value AS asof_click_value
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val l = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val r = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max(col("event_id")).as("click_id"),
        expr("max_by(value, event_id)").as("click_value"))
    Temporal.asofJoin(l, r, key = "user_id", ts = "ts", tiebreak = "click_id",
        payload = Seq("click_id", "click_value"))
      .select(col("event_id").as("id"), col("user_id"), col("ts"), col("value"),
        col("asof_ts"), col("asof_click_id"), col("asof_click_value"))
      .orderBy("id")
  }

  /** The stream-stream interval join over a REAL Structured Stream of
    * the events table (EventsStream.enrichJoin): each view paired with
    * the same user's clicks from the preceding 24 h, emitted in append
    * mode and hash-compared against DuckDB's batch replay of the same
    * predicate — batch/stream parity enforced by the driver gate itself
    * (the q8_stream_score convention, for the join face the other five
    * streaming faces don't cover).
    */
  val q11StreamJoin = NamedQuery(
    "q11_stream_join",
    """WITH v AS (SELECT event_id AS view_id, ts AS vts, user_id, value FROM events WHERE event_type = 'view'),
      |c AS (SELECT event_id AS click_id, ts AS cts, user_id, value AS click_value
      |      FROM events WHERE event_type = 'click')
      |SELECT v.view_id, v.user_id, v.vts, c.click_id, c.cts, c.click_value
      |FROM v JOIN c ON v.user_id = c.user_id
      |  AND c.cts <= v.vts AND c.cts >= v.vts - INTERVAL 24 HOURS
      |ORDER BY view_id, click_id""".stripMargin) { (s, d) =>
    graft.streaming.EventsStream.runAsStream(s, d,
        ev => graft.streaming.EventsStream.enrichJoin(ev),
        outputMode = "append")
      .orderBy("view_id", "click_id")
  }

  /** Purchase-attribution RANGE join: every click in the 10 minutes up to
    * each purchase, across ALL users — no equality key anywhere, the
    * shape Spark alone would plan as a BroadcastNestedLoopJoin. Served by
    * the bucketized equi-join (width = the 600 s window, so each interval
    * explodes to ≤ 2 buckets); DuckDB replays the plain BETWEEN join.
    * Timestamps compare as unix_micros longs in both engines.
    */
  val q16RangeJoin = NamedQuery(
    "q16_range_join",
    """WITH c AS (SELECT event_id, epoch_us(ts) AS v FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id, epoch_us(ts) - 600000000 AS lo, epoch_us(ts) AS hi
      |      FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id AS point_id, p.event_id AS interval_id,
      |  c.v AS v, p.lo AS lo, p.hi AS hi
      |FROM c JOIN p ON c.v >= p.lo AND c.v <= p.hi
      |ORDER BY point_id, interval_id""".stripMargin) { (s, d) =>
    // NTZ walls are UTC by Tables.events contract; timestampdiff from the
    // NTZ epoch is micros-since-epoch under ANY session timezone (an
    // unix_micros(cast) round-trip would read the session zone)
    val tus = expr(
      "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), tus.as("v"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"),
        (tus - 600000000L).as("lo"), tus.as("hi"))
    graft.operators.RangeJoin.pointInInterval(
        clicks, col("event_id"), col("v"),
        purchases, col("event_id"), col("lo"), col("hi"),
        bucketWidth = 600000000L)
      .orderBy("point_id", "interval_id")
  }

  val all: Seq[NamedQuery] = Seq(q10AsofJoin, q11StreamJoin, q16RangeJoin)
}
