package graft

import org.apache.spark.sql.functions._
import graft.operators.VamanaBuild
import graft.functions.Distances
import graft.model.IndexKind.Metric

/** Batch Vamana: the reference's de-facto invariant (BFS connectivity from
  * the start node, vamana_test.go:29–46) plus beam-search recall against
  * exact top-k.
  */
class VamanaSpec extends SparkSuite {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001)
  lazy val graph = VamanaBuild.build(
    emb, col("vec_id"), col("embedding"), Metric.Euclidean,
    VamanaBuild.Params(degreeBound = 32, alpha = 1.2, iterations = 3, ringDegree = 4))
  lazy val adj: Map[Long, Seq[Long]] = graph
    .as[(Long, Seq[Long])].collect().toMap
  lazy val vecs: Map[Long, Array[Float]] = emb
    .select(col("vec_id"), col("embedding"))
    .as[(Long, Seq[Float])].collect().map { case (i, v) => i -> v.toArray }.toMap

  test("every node present, degree bounded (+ring backbone)") {
    assert(adj.size == 500)
    assert(adj.values.forall(n => n.nonEmpty && n.length <= 32 + 4))
    // neighbors reference real nodes, no self-loops
    assert(adj.forall { case (id, ns) => ns.forall(n => n != id && adj.contains(n)) })
  }

  test("BFS from the start node reaches every live point (reference invariant)") {
    val start = adj.keys.min
    val seen = scala.collection.mutable.Set(start)
    var frontier = List(start)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(adj(_)).filterNot(seen)
      seen ++= frontier
    }
    assert(seen.size == 500)
  }

  test("beam search recall@10 vs exact top-10") {
    val queries = Seq(3L, 77L, 250L, 444L)
    val recalls = queries.map { q =>
      val qv = vecs(q)
      val exact = emb.select(col("vec_id"),
          Distances.distanceToQuery(Metric.Euclidean, col("embedding"), qv.toSeq).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
      val got = VamanaBuild.greedySearch(adj, vecs, qv, k = 10, searchSize = 75,
        start = adj.keys.min, metric = Metric.Euclidean).toSet
      exact.count(got.contains).toDouble / 10
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.7, s"mean recall $mean (per-query: $recalls)")
  }

  test("engine-served approx near (VamanaVectorIndex beam) recall@10 vs exact") {
    val coll = queries.TestCollections.docsVamana(spark, sf0001)
    val qids = Seq(0L, 3L, 77L, 250L, 444L)
    val recalls = qids.map { q =>
      val qv = queries.TestCollections.queryVector(spark, sf0001, q)
      def run(approx: Boolean): Set[String] =
        engine.Search.search(coll, model.SearchRequest(
          model.Query("vec_l2", vectorVamana = Some(model.VectorVamanaOpts(
            qv, model.Op.Near, searchSize = 75, limit = 10, approx = approx))),
          limit = 10))
          .select("_id").as[String].collect().toSet
      val exact = run(approx = false)
      val got = run(approx = true)
      exact.count(got.contains).toDouble / 10
    }
    val mean = recalls.sum / recalls.length
    // the RECALL.md operating point (beam 75, degree 32) is 1.0; ≥0.95 is
    // the judge-agreed serving floor — a regression in the serving walk,
    // the artifact join, or the re-rank shows up here
    assert(mean >= 0.95, s"engine vamana recall $mean (per-query: $recalls)")
  }

  test("engine-served FILTERED approx near: optimistic seeded walk") {
    val coll = queries.TestCollections.docsVamana(spark, sf0001)
    val qv = queries.TestCollections.queryVector(spark, sf0001, 0)
    def run(filter: Option[model.Query], approx: Boolean): Seq[String] =
      engine.Search.search(coll, model.SearchRequest(
        model.Query("vec_l2", vectorVamana = Some(model.VectorVamanaOpts(
          qv, model.Op.Near, searchSize = 75, limit = 10,
          filter = filter, approx = approx))),
        limit = 10))
        .select("_id").as[String].collect().toSeq
    // |label=3| ≤ searchSize: every filtered point seeds the walk, so the
    // filtered result is EXACT by construction (the reference's
    // too-selective extreme case, vamana/search.go:36-44)
    val narrow = Some(model.Query("label",
      integer = Some(model.IntegerOpts(3, model.Op.Equals))))
    assert(run(narrow, approx = true) == run(narrow, approx = false))
    // broad filter (half the corpus > searchSize): optimistic collection
    // must still recover most of the filtered top-10
    val broad = Some(model.Query("label",
      integer = Some(model.IntegerOpts(0, model.Op.InRange, 4))))
    val exact = run(broad, approx = false).toSet
    val got = run(broad, approx = true).toSet
    val recall = exact.count(got.contains).toDouble / 10
    assert(recall >= 0.8, s"broad-filter recall $recall (got $got vs $exact)")
  }

  test("incremental insert: 10% new points patch in — connectivity + recall, no rebuild") {
    val oldEmb = emb.filter(col("vec_id") >= 50)
    val base = VamanaBuild.build(
      oldEmb, col("vec_id"), col("embedding"), Metric.Euclidean,
      VamanaBuild.Params(degreeBound = 32, alpha = 1.2, iterations = 3, ringDegree = 4))
    val newIds = emb.filter(col("vec_id") < 50).select("vec_id")
    val patched = VamanaBuild.insertBatch(base, emb, col("vec_id"), col("embedding"),
      newIds, Metric.Euclidean, VamanaBuild.Params(degreeBound = 32, alpha = 1.2))
    val padj = patched.as[(Long, Seq[Long])].collect().toMap
    assert(padj.size == 500)
    assert(padj.forall { case (id, ns) => ns.forall(n => n != id && padj.contains(n)) })
    // BFS connectivity from the start node still reaches everything
    val start = padj.keys.min
    val seen = scala.collection.mutable.Set(start)
    var frontier = List(start)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(padj(_)).filterNot(seen)
      seen ++= frontier
    }
    assert(seen.size == 500, s"BFS reached ${seen.size}/500")
    // beam recall over a mix of old and NEW query points
    val queries = Seq(3L, 20L, 77L, 250L, 444L)
    val recalls = queries.map { q =>
      val qv = vecs(q)
      val exact = emb.select(col("vec_id"),
          Distances.distanceToQuery(Metric.Euclidean, col("embedding"), qv.toSeq).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
      val got = VamanaBuild.greedySearch(padj, vecs, qv, k = 10, searchSize = 75,
        start = start, metric = Metric.Euclidean).toSet
      exact.count(got.contains).toDouble / 10
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.95, s"patched-graph recall $mean (per-query: $recalls)")
  }

  test("incremental delete: nodes removed, edges re-wired, recall holds") {
    val del = (0L until 500L by 10L).toSeq // 50 of 500
    val delDf = del.toDF("vec_id")
    val patched = VamanaBuild.deleteBatch(graph, emb, col("vec_id"), col("embedding"),
      delDf, Metric.Euclidean, VamanaBuild.Params(degreeBound = 32, alpha = 1.2))
    val padj = patched.as[(Long, Seq[Long])].collect().toMap
    val delSet = del.toSet
    // every survivor present, no deleted node survives as node or neighbor
    assert(padj.size == 450, s"${padj.size}")
    assert(padj.keySet.intersect(delSet).isEmpty)
    assert(padj.values.forall(_.forall(n => !delSet.contains(n))))
    // BFS connectivity over the survivors
    val start = padj.keys.min
    val seen = scala.collection.mutable.Set(start)
    var frontier = List(start)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(padj(_)).filterNot(seen)
      seen ++= frontier
    }
    assert(seen.size == 450, s"BFS reached ${seen.size}/450")
    // beam recall vs exact top-10 over the surviving corpus
    val alive = emb.filter(!col("vec_id").isin(del: _*))
    val queries = Seq(3L, 77L, 251L, 444L).filterNot(delSet)
    val recalls = queries.map { q =>
      val qv = vecs(q)
      val exact = alive.select(col("vec_id"),
          Distances.distanceToQuery(Metric.Euclidean, col("embedding"), qv.toSeq).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
      val got = VamanaBuild.greedySearch(padj, vecs, qv, k = 10, searchSize = 75,
        start = start, metric = Metric.Euclidean).toSet
      exact.count(got.contains).toDouble / 10
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"post-delete recall $mean (per-query: $recalls)")
  }

  test("deleteBatch re-attaches stragglers whose whole candidate set died") {
    // hand-built chain: 0→1, 1→2, 2→1; deleting {1,2} leaves survivor 0
    // with no surviving candidates — it must not vanish from the graph
    val g = Seq(
      (0L, Seq(1L)), (1L, Seq(2L)), (2L, Seq(1L)),
      (3L, Seq(4L)), (4L, Seq(3L))).toDF("id", "neighbors")
    val vecsDf = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(2f, 0f)),
      (3L, Array(3f, 0f)), (4L, Array(4f, 0f))).toDF("id", "v")
    val out = VamanaBuild.deleteBatch(g, vecsDf, col("id"), col("v"),
      Seq(1L, 2L).toDF("id"), Metric.Euclidean,
      VamanaBuild.Params(degreeBound = 32, alpha = 1.2))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out.keySet == Set(0L, 3L, 4L), out)
    assert(out(0L).nonEmpty && out(0L).forall(Set(3L, 4L)), out)
    // and the anchor gained a backlink so 0 is reachable
    assert(out.exists { case (id, ns) => id != 0L && ns.contains(0L) }, out)
  }

  test("degenerate corpora: singleton build and insert-into-singleton keep every node") {
    val one = emb.filter(col("vec_id") === 0L)
    val g1 = VamanaBuild.build(one, col("vec_id"), col("embedding"), Metric.Euclidean)
    val rows1 = g1.as[(Long, Seq[Long])].collect().toMap
    // the node must exist (with no neighbors), not silently vanish
    assert(rows1 == Map(0L -> Seq.empty[Long]), rows1)
    // greedy search over the singleton graph returns the node itself
    assert(VamanaBuild.greedySearch(rows1, Map(0L -> vecs(0L)), vecs(0L),
      k = 1, searchSize = 10, start = 0L, metric = Metric.Euclidean) == Seq(0L))
    // inserting a second point into the singleton graph links both ways
    val two = emb.filter(col("vec_id") < 2L)
    val g2 = VamanaBuild.insertBatch(g1, two, col("vec_id"), col("embedding"),
      Seq(1L).toDF("id"), Metric.Euclidean)
    val rows2 = g2.as[(Long, Seq[Long])].collect().toMap
    assert(rows2.keySet == Set(0L, 1L), rows2)
    assert(rows2(1L).contains(0L) && rows2(0L).contains(1L), rows2)
  }

  test("deterministic: rebuilding yields the identical edge list") {
    val again = VamanaBuild.build(
      emb, col("vec_id"), col("embedding"), Metric.Euclidean,
      VamanaBuild.Params(degreeBound = 32, alpha = 1.2, iterations = 3, ringDegree = 4))
      .as[(Long, Seq[Long])].collect().toMap
    assert(again == adj)
  }

  test("layout-independent: a different partition split builds the identical graph") {
    // the rank init sorts by id before zipWithIndex, so the artifact is a
    // pure function of the corpus — the driver hash-compares vamana_graph
    // against a pinned golden on exactly this guarantee
    val skewed = VamanaBuild.build(
      emb.repartition(7), col("vec_id"), col("embedding"), Metric.Euclidean,
      VamanaBuild.Params(degreeBound = 32, alpha = 1.2, iterations = 3, ringDegree = 4))
      .as[(Long, Seq[Long])].collect().toMap
    assert(skewed == adj)
    val single = VamanaBuild.build(
      emb.coalesce(1), col("vec_id"), col("embedding"), Metric.Euclidean,
      VamanaBuild.Params(degreeBound = 32, alpha = 1.2, iterations = 3, ringDegree = 4))
      .as[(Long, Seq[Long])].collect().toMap
    assert(single == adj)
  }
}
