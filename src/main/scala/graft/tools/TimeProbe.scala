package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe for the flat approx serving cost at bench scale: splits a
  * request's wall time into PLAN (analyze + optimize + physical planning,
  * forced via executedPlan) and EXECUTE (collect on the planned frame),
  * for the single SQ8 route and the 5-query batched route. Built to test
  * the hypothesis that the 64-term reconstructed-distance expression
  * chains make Catalyst tree-walking, not execution, the dominant cost
  * of these gates at toy scale.
  * Usage: `runMain graft.tools.TimeProbe <sfDir>`.
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val coll = graft.queries.TestCollections.docsSq8(spark, sfDir)
    def req(qi: Long) = graft.model.SearchRequest(
      graft.model.Query("embedding", vectorFlat = Some(graft.model.VectorFlatOpts(
        graft.queries.TestCollections.queryVector(spark, sfDir, qi),
        graft.model.Op.Near, 10, approx = true))),
      limit = 100)
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (round <- 1 to 3) {
      val (df1, build1) = t(graft.engine.Search.search(coll, req(0)))
      val (_, plan1) = t(df1.queryExecution.executedPlan)
      val (_, exec1) = t(df1.collect())
      println(f"[probe] r$round single: build $build1%.2f plan $plan1%.2f exec $exec1%.2f")
      val (dfs, buildN) = t(graft.engine.Search.searchMany(coll, (0L to 4L).map(req)))
      val (_, planN) = t(dfs.foreach(_.queryExecution.executedPlan))
      val (_, execN) = t(dfs.foreach(_.collect()))
      println(f"[probe] r$round batch5: build $buildN%.2f plan $planN%.2f exec $execN%.2f")
    }
    spark.stop()
  }
}
