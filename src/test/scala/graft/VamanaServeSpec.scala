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
}
