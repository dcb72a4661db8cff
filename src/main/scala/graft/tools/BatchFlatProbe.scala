package graft.tools

import org.apache.spark.sql.SparkSession
import graft.model._
import graft.engine.Search

/** Cost probe for the fused flat candidate scan (round-12 verdict item
  * #4): time Search.searchMany on the SQ8-served docs collection at
  * K ∈ {1, 5, 32} (and the K=5 posexplode-era baseline is the round-11
  * SURVEY record, 5.0 s at sf0.1) — the de-exploded aggregator must hold
  * sub-linear growth to K=32, where the old K× row inflation dominated.
  *
  * Usage: `runMain graft.tools.BatchFlatProbe [sfDir] [passes]`
  */
object BatchFlatProbe {
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
    val coll = graft.queries.TestCollections.docsSq8(spark, sfDir)
    coll.df.count() // warm the join + SQ8 artifact
    val nBase = graft.Tables.embeddings(spark, sfDir).count()
    def req(i: Long) = SearchRequest(
      Query("embedding", vectorFlat = Some(VectorFlatOpts(
        graft.queries.TestCollections.queryVector(spark, sfDir, i % nBase),
        Op.Near, 10, approx = true))),
      limit = 100)
    // one untimed run to JIT the whole path
    Search.searchMany(coll, Seq(req(0))).foreach(_.count())
    for (k <- Seq(1, 5, 32)) {
      val reqs = (0L until k.toLong).map(req)
      val best = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        Search.searchMany(coll, reqs).foreach(_.count())
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[batchflat] K=$k%-3d min-of-$passes ${best}%.2f s  (${best / k}%.3f s/query)")
    }
    spark.stop()
  }
}
