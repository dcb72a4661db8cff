package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale evidence for the streaming family (round-12 verdict item #5:
  * "check state-store sizing, per-batch re-planning, and watermark-state
  * bounds at 100× event volume"). Models a 100× stream the honest way —
  * MORE HOURS of events, not a denser instant: the events table is
  * replicated `factor`× with event ids offset AND timestamps shifted by
  * k·(span+1h) per copy, written as one file per copy so the file source
  * (maxFilesPerTrigger=1) delivers copies as consecutive micro-batches in
  * event-time order. Each watermarked operator's state must then stay
  * BOUNDED (the watermark expires old windows/join rows batch over
  * batch) while total processed rows grow with the factor — the §5
  * property that makes these operators 100 TB streams, which a single
  * replayed-batch measurement cannot show.
  *
  * For each transform it prints wall seconds, batches, total input rows,
  * and the LAST progress's state-operator totals (rows in state + state
  * memory) — the bound is the MAX across batches, also printed.
  *
  * Usage: `runMain graft.tools.StreamScaleProbe [sfDir] [factor] [which]`
  * (which = comma set of q7,q8,q9,q11,q15; default all).
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val which = args.lift(2).map(_.split(",").toSet)
      .getOrElse(Set("q7", "q8", "q9", "q11", "q15"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- time-extended replica, one parquet file per copy ----------------
    val events = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val stats = events.agg(
      max(col("event_id")), min(col("ts")), max(col("ts")), count(lit(1))).head()
    val eStep = stats.getLong(0) + 1
    val (tMin, tMax) = (stats.getAs[java.time.LocalDateTime](1),
      stats.getAs[java.time.LocalDateTime](2))
    val spanSec = java.time.Duration.between(tMin, tMax).getSeconds + 3600
    val baseRows = stats.getLong(3)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_scale_").toString
    val t0 = System.nanoTime()
    (0 until factor).foreach { k =>
      events.select(
          (col("event_id") + lit(k * eStep)).as("event_id"),
          (col("ts") + expr(s"INTERVAL ${k * spanSec} SECONDS")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1)
        .write.mode("append").parquet(dir)
    }
    println(f"[probe] replica factor=$factor rows=${baseRows * factor} " +
      f"build ${(System.nanoTime() - t0) / 1e9}%.1f s (untimed)")

    // ---- the five streaming transforms, as the gates run them ------------
    import graft.streaming.EventsStream
    val transforms = Seq[(String, String, DataFrame => DataFrame)](
      ("q7", "complete", EventsStream.windowedAgg),
      ("q8", "append", ev => graft.operators.TextAnalysis.quality(
        ev, col("event_id"), col("props"))),
      ("q9", "complete", ev => ev.filter(col("props").isNotNull)
        .groupBy(md5(col("props")).as("content_md5"))
        .agg(count(lit(1)).as("n_dups"), min(col("event_id")).as("keeper_id"))),
      ("q11", "append", ev => EventsStream.enrichJoin(ev)),
      ("q15", "complete", ev => graft.operators.Sketches.countMinSketch(
        ev.select(col("user_id").cast("string").as("item")),
        col("item"), width = 1 << 20, depth = 4))
    ).filter(t => which.contains(t._1))

    transforms.foreach { case (name, mode, transform) =>
      val prevShuffle = spark.conf.getOption("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        spark.conf.getOption("graft.stream.parityPartitions").getOrElse("8"))
      try {
        val raw = spark.readStream
          .schema(EventsStream.Schema.fields.foldLeft(new StructType()) {
            case (s, f) if f.name == "ts" => s.add("ts", TimestampNTZType)
            case (s, f) => s.add(f)
          })
          .option("maxFilesPerTrigger", "1")
          .parquet(dir)
        val ev = raw.withColumn("ts", col("ts").cast("timestamp"))
        val qname = s"probe_${name}_${System.nanoTime()}"
        val t1 = System.nanoTime()
        val q = transform(ev).writeStream
          .format("memory").queryName(qname).outputMode(mode).start()
        try q.processAllAvailable() finally q.stop()
        val wall = (System.nanoTime() - t1) / 1e9
        val progress = q.recentProgress.toSeq
        val batches = progress.length
        val inRows = progress.map(_.numInputRows).sum
        def stateRows(p: org.apache.spark.sql.streaming.StreamingQueryProgress) =
          p.stateOperators.map(_.numRowsTotal).sum
        def stateMem(p: org.apache.spark.sql.streaming.StreamingQueryProgress) =
          p.stateOperators.map(_.memoryUsedBytes).sum
        val maxState = if (progress.isEmpty) 0L else progress.map(stateRows).max
        val lastState = progress.lastOption.map(stateRows).getOrElse(0L)
        val maxMem = if (progress.isEmpty) 0L else progress.map(stateMem).max
        val outRows = spark.table(qname).count()
        spark.catalog.dropTempView(qname)
        println(f"[probe] $name factor=$factor wall=$wall%.2f s batches=$batches " +
          f"inRows=$inRows outRows=$outRows maxStateRows=$maxState " +
          f"lastStateRows=$lastState maxStateMemMB=${maxMem / 1e6}%.1f")
      } finally prevShuffle match {
        case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
        case None => spark.conf.unset("spark.sql.shuffle.partitions")
      }
    }
    graft.Fs.deleteTree(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}
