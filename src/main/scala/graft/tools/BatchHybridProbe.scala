package graft.tools

import org.apache.spark.sql.SparkSession
import graft.model._
import graft.engine.Search

/** Cost probe for leaf-wise hybrid batching (round 12): K complete
  * `_or`(approx vamana + text) requests through ONE Search.searchMany
  * call vs the same K as independent Search.search calls. The batch
  * shares one hop-fused walk wave across the K vamana leaves and one
  * postings/df/score pass across the K text leaves, so the batched cost
  * must grow sub-linearly in K while the sequential cost is ~K×.
  *
  * Usage: `runMain graft.tools.BatchHybridProbe [sfDir] [passes] [mode]`
  * where mode ∈ {hybrid (default), vamana, text} isolates one family —
  * single-leaf requests of just that kind — for per-family attribution.
  */
object BatchHybridProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val coll = graft.queries.TestCollections.docsVamana(spark, sfDir)
    coll.df.count() // warm the join + graph artifact
    val nBase = graft.Tables.embeddings(spark, sfDir).count()
    // vary terms across two sets so the text group exercises the
    // union-of-terms path, not just the identical-leaf dedup
    val termSets = Seq("spark filter merge", "vector window table")
    val mode = args.lift(2).getOrElse("hybrid") // hybrid | vamana | text
    def vamanaLeaf(i: Long) =
      Query("vec_l2", vectorVamana = Some(VectorVamanaOpts(
        graft.queries.TestCollections.queryVector(spark, sfDir, i % nBase),
        Op.Near, searchSize = 75, limit = 10, weight = Some(0.5f),
        approx = true)))
    def textLeaf(i: Long) =
      Query("text", text = Some(TextOpts(termSets((i % 2).toInt),
        Op.ContainsAny, 20, weight = Some(2.0f))))
    def req(i: Long) = SearchRequest(mode match {
      case "vamana" => vamanaLeaf(i)
      case "text" => textLeaf(i)
      case _ => Query("_or", or = Seq(vamanaLeaf(i), textLeaf(i)))
    }, limit = 100)
    // one untimed run to JIT the whole path (and build the text index)
    Search.searchMany(coll, Seq(req(0))).foreach(_.count())
    for (k <- Seq(1, 4, 16)) {
      val reqs = (0L until k.toLong).map(req)
      val batched = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        Search.searchMany(coll, reqs).foreach(_.count())
        (System.nanoTime() - t0) / 1e9
      }.min
      val sequential = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        reqs.foreach(r => Search.search(coll, r).count())
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[batchhybrid] K=$k%-3d batched min-of-$passes ${batched}%.2f s " +
        f"(${batched / k}%.3f s/req)  sequential ${sequential}%.2f s " +
        f"(${sequential / k}%.3f s/req)  speedup ${sequential / batched}%.2fx")
    }
    spark.stop()
  }
}
