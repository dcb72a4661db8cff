package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StructType}

/** Temporal join operators over event streams.
  *
  * The centerpiece is the AS-OF join — "for each left row, the single
  * most recent right row at or before it, per key" — the time-series
  * primitive classic analytics engines ship natively (DuckDB ASOF JOIN,
  * kdb aj) and Spark lacks. The Spark-first shape is NOT a per-left-row
  * subquery or an inequality join (both explode into range scans):
  * union-tag the two sides, then one per-key running `last(_, ignoreNulls)`
  * window in event-time order carries the latest right payload forward
  * into each left row. One shuffle on the key, one ordered scan per key,
  * no pair materialization — the same plan an interval-skip-list engine
  * executes, expressed declaratively.
  *
  * Scale (100 TB): the window partitions by the join key, so per-task work
  * is bounded by one key's event history (the retention contract — the
  * same bound q6_sessionize relies on; PlanLintSpec allowlists these
  * keys). A pathologically hot key serializes within its partition; the
  * mitigation at that scale is time-bucketing the key upstream (carrying
  * each bucket's last right row forward one bucket), which composes from
  * this same operator applied per bucket.
  */
object Temporal {

  /** Left as-of join: every row of `left` gains `prefix`-named copies of
    * `payload` columns from the latest `right` row with `right.ts <=
    * left.ts` and equal `key` (inclusive match — the DuckDB/kdb
    * convention), or nulls when no right row precedes it.
    *
    * `tiebreak` (an integral right column) orders right rows sharing an
    * exact timestamp (the max tiebreak value wins), making the result
    * deterministic under any partition layout. The determinism contract
    * assumes (key, ts, tiebreak) identifies a right row — tiebreak is
    * normally a unique event id; two FULLY identical sort keys with
    * different payloads would leave the window's pick arbitrary.
    *
    * Left rows ride through the union as a NATIVE struct of their own
    * columns, mirroring the `_r` payload struct — lossless for every
    * Spark type (microsecond/nanosecond timestamps, binary, maps; a JSON
    * round-trip here would silently truncate sub-millisecond precision,
    * Spark's default JSON timestamp format being millisecond-scale).
    *
    * The key and ts column NAMES are preserved through the internal union
    * so the plan's window partition key remains the caller's key column
    * (PlanLint audits window keys by name).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tiebreak: String,
      payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    // payload carrying ts would emit two identically-named prefix+ts
    // output columns (one from _rts, one from the payload mapping)
    require(!payload.contains(ts),
      s"payload must not contain the ts column '$ts' — it is always " +
        s"emitted as $prefix$ts")
    // a non-numeric tiebreak would cast to null → constant MinValue for
    // every row, silently voiding the determinism contract; the long cast
    // below is lossless for integral types only
    require(right.schema(tiebreak).dataType.isInstanceOf[NumericType],
      s"tiebreak column '$tiebreak' must be numeric (got " +
        s"${right.schema(tiebreak).dataType.simpleString})")
    val leftCols = left.columns.toSeq
    val leftStructType = StructType(leftCols.map(c => left.schema(c)))
    // the carried right payload: its event time plus the requested columns
    val rStructCols = col(ts).as("_rts") +: payload.map(col)
    val rightTagged = right.select(
      col(key), col(ts),
      lit(0).as("_side"),
      coalesce(col(tiebreak).cast("long"), lit(Long.MinValue)).as("_tb"),
      struct(rStructCols: _*).as("_r"),
      lit(null).cast(leftStructType).as("_l"))
    // left rows ride along as a native struct of their own columns;
    // unioning by NAME keeps the schemas honest if either side evolves
    val leftTagged = left.select(
      col(key), col(ts),
      lit(1).as("_side"),
      lit(Long.MaxValue).as("_tb"), // left sorts after right at equal ts
      lit(null).cast(rightTagged.schema("_r").dataType).as("_r"),
      struct(leftCols.map(col): _*).as("_l"))
    // at equal ts: right (_side 0) sorts first, so the match is inclusive;
    // among right ties the greatest tiebreak lands nearest the left row
    // and `last` picks it
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightTagged.unionByName(leftTagged)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        leftCols.map(c => col(s"_l.$c").as(c)) ++
          (col("_m._rts").as(s"$prefix$ts") +:
            payload.map(p => col(s"_m.$p").as(s"$prefix$p"))): _*)
  }
}
