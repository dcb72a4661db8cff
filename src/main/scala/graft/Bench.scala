package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // runAsStream (q7_stream_window) hard-requires UTC; without this the
      // bench would -1 that query on any host whose JVM default isn't UTC
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Joins: let the planner pick shuffled-hash over sort-merge when the
      // build side fits (filter-set semi-joins on _id otherwise SMJ-sort
      // the WIDE candidate stream per request — the same never-sort-the-
      // payload-stream rule the dedup verify joins learned at 100×), and
      // let AQE rewrite a planned SMJ to SHJ from REAL post-shuffle
      // partition sizes. Both parameterized: a cluster profile re-tunes
      // via env. Caveat (round-12 advice): preferSortMergeJoin=false
      // changes the STATIC planner choice from ESTIMATED sizes, and a
      // shuffled-hash build map does not spill — a badly underestimated
      // or skewed build side can OOM where SMJ would not. The AQE
      // threshold path is the safe half (it decides from REAL partition
      // sizes and stops applying past 64m); a memory-tight cluster
      // profile should set SPARK_GRAFT_PREFER_SMJ=true and rely on the
      // AQE rewrite alone. The engine's own bounded-build joins are
      // explicit (broadcast()/shuffle_hash hints), so they don't depend
      // on this session default either way.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "64m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated subset for local iteration (absent = all)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        val unknown = names -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_ONLY names not in the registry: ${unknown.mkString(", ")}")
        SparkEntry.queries.filter(kv => names.contains(kv._1))
      case None => SparkEntry.queries
    }
    // Untimed warm-up: the baseline's published numbers are warm-cache QPS,
    // so measure warm too. One pass over the shared infrastructure — parquet
    // footers/codegen for every table, the docs collection + its text index,
    // one vector top-k and one text search to JIT the kernels — then clear
    // caches so the timed region still pays each query's own work.
    try {
      import org.apache.spark.sql.functions.col
      // derive from the declared registry so a new table can't silently
      // miss its warm-up (events needs its dedicated loader, next line)
      Tables.names.filterNot(_ == "events")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
      Tables.events(spark, sfDir).count()
      val docs = queries.TestCollections.docs(spark, sfDir)
      docs.df.count()
      val qv = queries.TestCollections.queryVector(spark, sfDir, 0)
      engine.Search.searchJson(docs,
        s"""{"query":{"property":"embedding","vectorFlat":{
           |"vector":[${qv.mkString(",")}],"operator":"near","limit":5}},
           |"limit":5}""".stripMargin).count()
      engine.Search.searchJson(docs,
        """{"query":{"property":"text","text":{"value":"the data",
          |"operator":"containsAny","limit":5}},"limit":5}""".stripMargin).count()
      // shingle/codegen warm-up for the dedup family: whichever dedup
      // query runs first otherwise pays several seconds of one-time JIT,
      // making per-query numbers depend on map iteration order
      import org.apache.spark.sql.functions.{col => c}
      val few = spark.read.parquet(s"$sfDir/documents.parquet").filter(c("doc_id") < 50)
      operators.Dedup.ngramJaccardPairs(few, c("doc_id"), c("text"), 3, 0.5).count()
      operators.TextAnalysis.winnow(few, c("doc_id"), c("text")).count()
      // graph-build JIT (window cap, TopK UDAF, prune UDF): a cold
      // VamanaBuild pays ~4s of one-time codegen (measured sf0.1: first
      // build 8.0s, second 3.9s) — warm it on a 60-node slice like the
      // dedup family above
      operators.VamanaBuild.build(
        spark.read.parquet(s"$sfDir/embeddings.parquet").filter(c("vec_id") < 60),
        c("vec_id"), c("embedding"), graft.model.IndexKind.Metric.Euclidean,
        operators.VamanaBuild.Params(
          degreeBound = 8, alpha = 1.2, iterations = 1, ringDegree = 2)).count()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    // IVF/IVF-PQ artifacts: building is a separate batch job by design
    // (the PipelineQueries doc) — build once here so the timed region
    // measures the partition-pruned SERVE path, like every other warm
    // index. Own try (an unrelated warmup failure must not skip these) and
    // gated on selection (SPARK_GRAFT_ONLY iteration shouldn't pay them).
    Seq(queries.PipelineQueries.annIvfPruned, queries.PipelineQueries.annIvfPqFixed)
      .filter(q => selected.contains(q.name))
      .foreach { q =>
        try q.build(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] warmup ${q.name}: $e") }
      }
    // Artifact-heavy gates: their FIRST invocation constructs a
    // session-cached serving artifact (the docs Vamana graph, store-served
    // coded tables, IVF-RaBitQ layouts, the trained classifier) — batch
    // build jobs by design, exactly like the IVF block above. Pre-run each
    // once UNTIMED so both timed passes measure the SERVE path; warm stays
    // the record by convention, and cold_total stops carrying one-time
    // builds (the r9→r10 cold drift was precisely the new coded-walk /
    // IVF-dot builds landing in pass 1). Same failure contract as the
    // timed region: a pre-build failure is the query's own failure to
    // report there, so here it only logs.
    Seq(
      "s1_near_vamana_euclidean", // attaches the shared docsVamana graph
      "w6_vamana_store_serve", "w12_opq_store_serve", "w13_rbq_store_serve",
      "w14_rbq_coded_walk", "ann_ivf_rbq", "ann_ivf_rbq_dot",
      "s2_near_ivfrbq_approx", // attaches the shared docsIvfRbq artifact
      "text_classifier")
      .filter(selected.contains)
      .foreach { name =>
        try selected(name)(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] prebuild $name: $e") }
      }
    spark.catalog.clearCache()
    // THREE timed passes by default, REPORT min-per-query: the per-round
    // record runs 170+ queries in one JVM, and pass-1 numbers carry
    // one-time JIT + page-cache noise that fabricated ~5× "regressions"
    // in earlier rounds (the baseline's published numbers are warm-cache
    // QPS, so warm is also the apples-to-apples measurement). Three
    // passes (round-12 verdict item #6) because the official record
    // swung ±20% across identical-code two-pass runs — ambient box
    // contention lands on SOME pass of SOME query, and min-over-three
    // shrinks the record's variance without touching semantics.
    // SPARK_GRAFT_PASSES=1 restores single-pass mode for local iteration.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt.max(1)
    def runPass(): Seq[(String, Double)] = selected.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must not masquerade as a fast success: record a
      // -1 sentinel in the JSON and shout on stderr
      val elapsed =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            -1.0
        }
      // isolate queries: operators persist derived index frames; dropping
      // them between queries (outside the timed region) keeps runs
      // independent of map iteration order
      spark.catalog.clearCache()
      // localCheckpoint blocks and shuffle files are reclaimed only when
      // their owning objects are GC'd (ContextCleaner) — negligible at
      // sf0.1, but dead shuffle files accumulate ACROSS queries and
      // passes (tens of GB at the 100× sweep; at the official 3-pass
      // shape they inflate later queries' I/O) — so the GC runs by
      // default in the official shape (round-12 verdict item #6); it
      // costs only UNTIMED wall-clock. SPARK_GRAFT_GC_BETWEEN=0 opts out
      // for quick local iteration.
      if (!sys.env.get("SPARK_GRAFT_GC_BETWEEN").contains("0")) System.gc()
      name -> elapsed
    }
    val allPasses = (1 to passes).map(_ => runPass())
    // per-query time = MIN over passes (robust to transient contention: a
    // warm pass polluted by a co-tenant can't fabricate a regression — the
    // round-6 record showed warm 195s > cold 181s from exactly that).
    // Failed only if the query failed in EVERY pass.
    val byName = allPasses.flatten.groupBy(_._1)
    val results: Seq[(String, Double)] = selected.keys.toSeq.map { name =>
      val ok = byName(name).map(_._2).filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }.sortBy { case (_, v) => if (v < 0) Double.NegativeInfinity else -v }
    def r2(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    // queries emitted COST-DESCENDING (failures first): the driver records
    // the LAST 2000 chars, so any truncation only drops the cheap tail
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r2(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val coldTotal = allPasses.head.collect { case (_, v) if v >= 0 => v }.sum
    // per-pass totals make cross-RUN swings diagnosable from the record
    // alone: stable passes within a run + a shifted total across runs =
    // session/box state (ambient), a noisy single pass = transient
    // contention that the min already absorbed. pass_fails disambiguates
    // the other direction: a pass whose total DROPPED because a query
    // failed in it (and was excluded from the sum) must not read as a
    // speedup — a nonzero entry says that pass's total is missing work.
    val passTotals = allPasses.map(p =>
      r2(p.collect { case (_, v) if v >= 0 => v }.sum)).mkString("[", ",", "]")
    val passFails = allPasses.map(_.count(_._2 < 0)).mkString("[", ",", "]")
    // FULL record (per-query map included) goes to bench_record.json only.
    // total = sum of per-query minima, so total ≤ cold_total by construction.
    val record = s"""{"metric":"total","value":${r2(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"pass_totals":$passTotals,"pass_fails":$passFails,"cold_total":${r2(coldTotal)},"nqueries":${results.length},"failed":$failed,"total":${r2(total)}}"""
    // COMPACT summary for stdout: the driver stores/parses only the LAST
    // 2000 chars of output, and the full record line is ~4 KB at 168
    // queries — it enters that window mid-JSON and can never parse (ten
    // rounds of BENCH parsed:null). The round-12 fix shrank the line to
    // ~200 chars but lost ALL per-query visibility (PERF per_query:{},
    // geomean:null — the round-12 verdict's #1 item). Middle ground: emit
    // the TOP-40 cost-descending per-query pairs inline (~1 KB — they
    // cover >60% of the total; failures sort first so a -1 is always
    // visible) plus `tail_total`/`ntail` so the full total remains
    // reconstructible; the complete map still lives in bench_record.json.
    // The failed list is capped at 10 names so even a catastrophic run
    // can't push the line past the window.
    val headN = 40
    val qsHead = results.take(headN)
      .map { case (k, v) => s"\"" + k + "\":" + r2(v) }.mkString("{", ",", "}")
    val tailTotal = results.drop(headN).collect { case (_, v) if v >= 0 => v }.sum
    val failedNames = results.collect { case (k, v) if v < 0 => k }
    val failedCompact = (failedNames.take(10).map("\"" + _ + "\"") ++
      (if (failedNames.length > 10) Seq("\"+" + (failedNames.length - 10) + " more\"") else Nil))
      .mkString("[", ",", "]")
    val compact = s"""{"metric":"total","value":${r2(total)},"unit":"sec","queries":$qsHead,"tail_total":${r2(tailTotal)},"ntail":${(results.length - headN).max(0)},"sf":"$sfDir","passes":$passes,"pass_totals":$passTotals,"pass_fails":$passFails,"cold_total":${r2(coldTotal)},"nqueries":${results.length},"nfailed":${failedNames.length},"failed":$failedCompact,"total":${r2(total)}}"""
    // Emit the record as the process's FINAL stdout line, AFTER teardown:
    // round 7's official artifact was unparseable because a StateStore
    // maintenance thread threw RpcEnvStoppedException after spark.stop()
    // and its stacktrace displaced the record from the driver's 2000-char
    // tail. Order: stop active streams → StateStore maintenance → SparkSession
    // → then print. Teardown noise (if any) now lands BEFORE the record.
    try spark.streams.active.foreach(_.stop())
    catch { case e: Throwable => System.err.println(s"[bench] stream stop: $e") }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case e: Throwable => System.err.println(s"[bench] statestore stop: $e") }
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"[bench] spark stop: $e") }
    // Belt-and-braces for the stdout parse: also persist the record to a
    // well-known file so the round record is recoverable even if some future
    // teardown noise displaces the final line again.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_record.json"),
      (record + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] record file: $e") }
    println(compact)
  }
}
