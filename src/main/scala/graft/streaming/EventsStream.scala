package graft.streaming

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: tumbling/sliding windowed
  * aggregation with watermarks, plus sessionization. Each transform is a
  * pure DataFrame→DataFrame function so the SAME code runs in batch mode
  * (for the DuckDB oracle) and streaming mode (readStream → memory sink,
  * exercised in tests): the Spark-native way to keep lambda/batch parity.
  */
object EventsStream {

  /** Events schema as transforms see it (ts arrives as TIMESTAMP_NTZ
    * after the Tables.events normalization; streaming reads substitute
    * the stored ts type — see runAsStream).
    */
  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val SessionGap = "30 minutes"

  /** Tumbling 1-hour windows per event type: count + sum(value).
    *
    * The sum accumulates in DECIMAL and is cast back to double once: a
    * plain double sum depends on accumulation order (partition count /
    * merge order), so batch and stream — or two runs at different
    * parallelism — could disagree in the last ulps. Exact accumulation
    * makes the operator deterministic (and lets q7_stream_window
    * hash-compare against DuckDB's exact DECIMAL sum).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double").as("sum_value"))
      .select(
        col("window.start").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Batch sessionization (gaps-and-islands): a session ends after 30
    * minutes of inactivity. Returns one row per session.
    */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // gap test at full event-time precision, boundary semantics matching
    // session_window: a session spans [t, t+gap), so a gap of EXACTLY 30
    // minutes starts a new session (>=, not >)
    val gapMicros = 1800L * 1000000L
    events
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      // diff NTZ wall times directly: casting NTZ→TIMESTAMP interprets in
      // the session zone, where a DST transition would shift gaps by an
      // hour and split/merge sessions wrongly
      .withColumn("_new_session",
        when(col("_prev").isNull ||
          expr("timestampdiff(MICROSECOND, _prev, ts)") >= gapMicros, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("_new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_no")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** Streaming sessionization via event-time session windows (watermarked
    * state, merges on gap ≤ 30 min) — the stateful-streaming counterpart
    * of [[sessionizeBatch]]. Boundaries come from min/max event time, NOT
    * `session_window.start/end`: the window's end is last-event + gap,
    * which would silently inflate every session by 30 minutes relative to
    * the batch path sharing these column names.
    */
  def sessionizeStreaming(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), SessionGap))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

  /** Streaming dedup WITHIN THE WATERMARK HORIZON: the first event per
    * key wins among events whose times fall inside the watermark delay; a
    * key recurring after its state expired is re-admitted. That bound is
    * the point — bounded state and unbounded exactness are mutually
    * exclusive in a stream (plain `dropDuplicates(keys)` is exact but
    * grows state forever unless the event-time column is a key); callers
    * needing global exactness run the batch `dropDuplicates` over the
    * landed data instead.
    */
  def dedupStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream time-interval ENRICHMENT join — the sixth streaming
    * face, and the one the others don't cover: every `view` event pairs
    * with the same user's `click` events from the preceding `interval`
    * (inclusive of the view instant). Both sides are watermarked, so this
    * is Spark's native stream-stream interval join: each side's state is
    * bounded by watermark delay + interval (old rows age out), and the
    * emitted pair set in append mode equals the batch join of the same
    * predicate — which is what lets the driver gate replay it in DuckDB.
    * An AS-OF reduction (keep only the latest click per view) would chain
    * a second stateful operator; batch [[graft.operators.Temporal]] owns
    * that reduction over the landed pairs (the lambda split the ingest
    * faces document).
    */
  def enrichJoin(events: DataFrame, interval: String = "24 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("vts"),
        col("user_id"), col("value").as("view_value"))
      .withWatermark("vts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("cts"),
        col("user_id").as("_cuser"), col("value").as("click_value"))
      .withWatermark("cts", "2 hours")
    views.join(clicks,
        col("user_id") === col("_cuser") &&
          col("cts") <= col("vts") &&
          col("cts") >= col("vts") - expr(s"INTERVAL $interval"))
      .select(col("view_id"), col("user_id"), col("vts"),
        col("click_id"), col("cts"), col("click_value"))
  }

  /** Continuously ingest a stream into a stored collection: each
    * micro-batch lands through the store's insert contract (≤ 10k-point
    * sub-batches, duplicate/clash checks, delta log) via `foreachBatch` —
    * exactly-once per the sink's idempotent id checks, so a replayed
    * micro-batch rejects rather than duplicates. The streaming face of W1.
    */
  def ingestInto(
      stream: DataFrame, store: graft.store.CollectionStore, name: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // spark's micro-batch can exceed the insert contract; split via
        // bounded collects (the contract caps memory at 10k rows per call)
        val spark = batch.sparkSession
        val schema = batch.schema
        // replay tolerance: drop rows already landed (crash between store
        // commit and checkpoint commit) AND in-batch duplicate ids —
        // either would make the insert contract reject the batch forever
        // on every restart
        // checkpoint BEFORE draining: the anti-join pins the store's
        // current delta frames, and the grouped inserts below advance the
        // store — enough of them trigger compactions that eventually
        // release those frames mid-iteration (lineage-free, unrecoverable).
        // The eager checkpoint copies the result into its own blocks,
        // independent of anything the store later retires.
        val fresh = batch
          .dropDuplicates(graft.store.CollectionStore.IdCol)
          .join(
            store.load(name).df.select(graft.store.CollectionStore.IdCol),
            Seq(graft.store.CollectionStore.IdCol), "left_anti")
          .localCheckpoint()
        // stream partitions to the driver instead of collecting the whole
        // micro-batch (a backlogged first trigger can hold millions of rows)
        try fresh.toLocalIterator().asScala
          .grouped(graft.store.CollectionStore.MaxInsertBatch).foreach { g =>
            val df = spark.createDataFrame(
              java.util.Arrays.asList(g.toSeq: _*), schema)
            store.insert(name, df)
          }
        finally org.apache.spark.sql.graft.Bridge.release(fresh)
      }
      .start()

  /** As [[ingestInto]], but EXECUTOR-SIDE: each micro-batch validates and
    * lands through `store.ingestBatch` — every check a distributed job,
    * the delta written one file per task, and the driver's only serial
    * work the commit rename. No `toLocalIterator`, no per-10k driver
    * round-trips: the path a 1000-executor ingest actually takes, while
    * [[ingestInto]] remains the strict reference-contract face (≤10k
    * insert batches). Same replay tolerance: rows already landed (crash
    * between store commit and checkpoint commit) anti-join away.
    * In-batch duplicate ids collapse to ONE row, but WHICH payload
    * survives is arbitrary (dropDuplicates keeps whichever row each
    * partition layout delivers first — there is no arrival order inside a
    * distributed micro-batch); a producer that needs a specific survivor
    * must dedupe upstream of the sink. Cross-batch, the anti-join makes
    * the FIRST batch to land an id the durable winner either way.
    */
  def ingestIntoDistributed(
      stream: DataFrame, store: graft.store.CollectionStore, name: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // checkpoint BEFORE landing, for the same lifecycle reason as
        // ingestInto: the anti-join pins the store's current delta frames,
        // and the ingest below can trigger a compaction that retires them
        val fresh = batch
          .dropDuplicates(graft.store.CollectionStore.IdCol)
          .join(
            store.load(name).df.select(graft.store.CollectionStore.IdCol),
            Seq(graft.store.CollectionStore.IdCol), "left_anti")
          .localCheckpoint()
        // ingestCheckpointed, not ingestBatch: THIS checkpoint is the
        // batch's one materialization — the public face would copy it all
        // over again
        try store.ingestCheckpointed(name, fresh)
        finally org.apache.spark.sql.graft.Bridge.release(fresh)
        () // foreachBatch wants Unit, ingestBatch returns the landed count
      }
      .start()

  /** Run any events transform as a real stream over the parquet file and
    * collect the complete result via a memory sink (test/demo harness).
    */
  def runAsStream(
      spark: SparkSession, sfDir: String,
      transform: DataFrame => DataFrame,
      outputMode: String = "complete"): DataFrame = {
    // the nanos→TIMESTAMP→NTZ round-trip below renders in the session
    // zone; anything but UTC shifts every wall value (and DST transitions
    // would warp gaps) relative to the zone-independent batch path
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "runAsStream requires spark.sql.session.timeZone=UTC for batch parity")
    // session-global and restored in the finally below: leaking it would
    // silently turn every LATER batch read of nanos parquet in this
    // session into LongType columns (test-order-dependent behavior)
    val prevNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Stateful operators allocate one state store per shuffle partition
    // per operator PER MICRO-BATCH (a stream-stream join runs four state
    // machines per partition), and this harness streams a bounded parity
    // corpus through 2-3 micro-batches — at the session's batch-oriented
    // partition count most of the wall time is empty-store commit/CRC
    // churn, not data. Run the stream narrow (graft.stream.parityPartitions,
    // default 8); restored in the finally. The PRODUCTION path
    // (ingestInto/landIncremental) keeps session settings — this knob is
    // scoped to the bounded harness where state is KB-sized by design.
    val prevShuffle = spark.conf.getOption("spark.sql.shuffle.partitions")
    val parityParts = spark.conf.getOption("graft.stream.parityPartitions")
      .getOrElse("8").toInt
    require(parityParts > 0, s"graft.stream.parityPartitions must be > 0: $parityParts")
    spark.conf.set("spark.sql.shuffle.partitions", parityParts.toString)
    try {
      // the stored logical type of `ts` varies across testdata
      // generations (TIMESTAMP(NANOS) → long under the legacy conf, or
      // plain TIMESTAMP(MICROS)); a streaming source needs an explicit
      // schema, so peek at the footer with a batch read first
      val eventsPath = s"$sfDir/events.parquet"
      val storedTs = spark.read.parquet(eventsPath).schema("ts").dataType
      val reader = spark.readStream
        .schema(StructType(Schema.fields.map {
          case f if f.name == "ts" => StructField("ts", storedTs)
          case f => f
        }))
      // the table ships either as one FILE named events.parquet inside
      // the scale dir (driver testdata) or as a part-file DIRECTORY of
      // that name (any written-at-scale layout, e.g. the ScaleSweep
      // replicas). The file source streams a directory natively; for the
      // single-file shape, stream the parent dir filtered to the file.
      val p = new org.apache.hadoop.fs.Path(eventsPath)
      val isDir = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).isDirectory
      val raw =
        if (isDir) reader.parquet(eventsPath)
        else reader.option("pathGlobFilter", "events.parquet").parquet(sfDir)
      // streaming watermarks require TIMESTAMP (not NTZ); with the session
      // in UTC the wall values match the batch NTZ path exactly
      val events = storedTs match {
        case LongType => // nanos as long
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp")) // UTC: identity walls
        case org.apache.spark.sql.types.TimestampType => raw
        case other =>
          throw new IllegalArgumentException(s"events.ts: unsupported stored type $other")
      }
      val name = s"graft_stream_${System.nanoTime()}"
      val q = transform(events).writeStream
        .format("memory").queryName(name).outputMode(outputMode).start()
      try q.processAllAvailable() finally q.stop()
      // normalize timestamps back to NTZ so results compare 1:1 with batch;
      // materialize and DROP the memory sink's table (in the finally, so a
      // failed collect can't leak it) — each sink caches its whole result
      // in the driver and would otherwise accumulate across calls
      try {
        val out = spark.table(name)
        val normalized = out.select(out.schema.fields.map { f =>
          if (f.dataType == org.apache.spark.sql.types.TimestampType)
            col(f.name).cast("timestamp_ntz").as(f.name)
          else col(f.name)
        }.toSeq: _*)
        val rows = normalized.collect()
        spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), normalized.schema)
      } finally spark.catalog.dropTempView(name)
    } finally {
      prevNanos match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      prevShuffle match {
        case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
        case None => spark.conf.unset("spark.sql.shuffle.partitions")
      }
    }
  }
}
