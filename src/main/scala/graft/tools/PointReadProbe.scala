package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Search
import graft.model._
import graft.store.CollectionStore

/** Measures the point-read backfill against the full-scan fallback on a
  * REAL store collection (round 12): one select-bearing exact `near`
  * request over the sf documents corpus (KB-wide rows — the payload shape
  * where backfill cost is visible), served (a) through the store-wired
  * `pointLookup` (bucket-pruned doc-table read) and (b) through the
  * pre-round fallback (`_id IN` filter over the merge-on-read view).
  * Reports warm per-request wall times; both routes return identical rows
  * (asserted per repetition).
  *
  * Run: tools/run_tool.sh graft.tools.PointReadProbe /root/testdata/sf0.1 [reps]
  */
object PointReadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(12)
    // "shuffle": destroy the seed's id clustering before create — the
    // realistic mixed-write base where the fallback's pushed `_id IN`
    // cannot row-group-prune (the testdata parquet is id-ordered, which
    // hands the scan route near-point-read pruning it won't have after
    // real ingest); report both shapes
    val shuffle = args.lift(2).contains("shuffle")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pointread-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_pointread_probe_")
    val store = new CollectionStore(spark, root.toString)
    // documents + a deterministic 2-d vector (hash-derived, so the exact
    // top-k ranking is stable and spread over the corpus)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").select(
      col("doc_id").cast("string").as("_id"),
      col("text"),
      array(
        pmod(xxhash64(col("doc_id")), lit(1000)).cast("float"),
        pmod(xxhash64(col("doc_id"), lit(7)), lit(1000)).cast("float")).as("vec"))
    val docs = if (shuffle) docs0.repartition(32, xxhash64(col("text"))) else docs0
    val schema = IndexSchema(
      "text" -> IndexKind.Str(caseSensitive = true),
      "vec" -> IndexKind.VectorFlat(2, IndexKind.Metric.Euclidean))
    store.create("docs", schema, docs)
    println(s"base layout: ${if (shuffle) "id-SHUFFLED (mixed-write shape)" else "id-ordered (testdata shape)"}")
    val n = store.load("docs").df.count()
    println(s"corpus: $n documents")

    def req(q: (Float, Float)) = SearchRequest(
      Query("vec", vectorFlat = Some(VectorFlatOpts(
        Seq(q._1, q._2), Op.Near, 10))),
      select = Seq("text"), limit = 10)
    val queries = (0 until reps).map(i => ((i * 83 % 1000).toFloat, (i * 131 % 1000).toFloat))

    val loaded = store.load("docs")
    val fallback = loaded.copy(pointLookup = None)
    def run(c: graft.engine.Collection, q: (Float, Float)): (Long, Seq[String]) = {
      val t0 = System.nanoTime()
      val rows = Search.search(c, req(q)).collect()
      ((System.nanoTime() - t0) / 1000000L, rows.map(_.getString(0)).toSeq)
    }
    // warm both routes (doc-table materialization lands here — the
    // documented pay-once attach; report it separately)
    val tAttach0 = System.nanoTime()
    run(loaded, (0f, 0f))
    val attachMs = (System.nanoTime() - tAttach0) / 1000000L
    run(fallback, (0f, 0f))
    println(s"first point-route request (incl. doc-table attach): $attachMs ms")

    // metadata-only baseline: same ranked leaf, NO backfill (the assemble
    // shortcut) — subtracting it isolates what each backfill route costs
    def baseReq(q: (Float, Float)) = SearchRequest(
      Query("vec", vectorFlat = Some(VectorFlatOpts(
        Seq(q._1, q._2), Op.Near, 10))), limit = 10)
    def runBase(q: (Float, Float)): Long = {
      val t0 = System.nanoTime()
      Search.search(loaded, baseReq(q)).collect()
      (System.nanoTime() - t0) / 1000000L
    }
    runBase((0f, 0f)) // warm

    // bytes-read accounting — at toy scale the page cache hides the I/O
    // difference, so wall time alone undersells the layout; bytes read per
    // request is the metric that scales (a 100 TB backfill either reads
    // ~k bucket row groups or the corpus)
    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def measured[A](body: => A): (A, Long) = {
      Thread.sleep(300) // drain listener bus
      val b0 = bytesRead.get()
      val r = body
      Thread.sleep(300)
      (r, bytesRead.get() - b0)
    }

    // micro-section: the RAW lookup (no ranked leaf, no join/sort) — where
    // does each backfill route's time actually go
    val liveIds = loaded.df.select("_id").limit(10).collect().map(_.getString(0)).toSeq
    def timeIt(label: String)(body: => Unit): Unit = {
      body // warm
      val (ts, bs) = measured((0 until 6).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1000000L
      })
      println(f"  $label: med ${ts.sorted.apply(3)}%d ms, ${bs.toDouble / 6 / 1048576}%.2f MB/op")
    }
    println("raw lookup micro-bench (10 ids):")
    timeIt("pointLookup")(loaded.pointLookup.get(liveIds).collect())
    timeIt("isin scan  ")(fallback.df.filter(col("_id").isin(liveIds: _*)).collect())

    val (baseTimes, baseBytes) = measured(queries.map(runBase))
    val ((ptTimes, ptRows), ptBytes) = measured(queries.map(run(loaded, _)).unzip)
    val ((scTimes, scRows), scBytes) = measured(queries.map(run(fallback, _)).unzip)
    require(ptRows == scRows, "routes diverged")
    def med(xs: Seq[Long]) = xs.sorted.apply(xs.size / 2)
    def stats(xs: Seq[Long]) =
      f"min ${xs.min}%d / med ${med(xs)}%d / mean ${xs.sum / xs.size}%d ms"
    def mb(b: Long) = f"${b.toDouble / reps / 1024 / 1024}%.1f MB/request"
    println(s"ranked-only (no backfill): ${stats(baseTimes)}, ${mb(baseBytes)}")
    println(s"point-read route: ${stats(ptTimes)} (backfill ≈ ${med(ptTimes) - med(baseTimes)} ms, +${mb(ptBytes - baseBytes)})")
    println(s"full-scan route:  ${stats(scTimes)} (backfill ≈ ${med(scTimes) - med(baseTimes)} ms, +${mb(scBytes - baseBytes)})")
    println(f"""{"probe":"point_backfill","n":$n,"reps":$reps,"base_med_ms":${med(baseTimes)},"point_med_ms":${med(ptTimes)},"scan_med_ms":${med(scTimes)},"point_backfill_mb":${(ptBytes - baseBytes).toDouble / reps / 1048576}%.2f,"scan_backfill_mb":${(scBytes - baseBytes).toDouble / reps / 1048576}%.2f}""")
    spark.stop()
  }
}
