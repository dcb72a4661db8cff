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

  val all: Seq[NamedQuery] = Seq(q10AsofJoin, q11StreamJoin)
}
