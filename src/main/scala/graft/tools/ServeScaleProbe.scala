package graft.tools

import org.apache.spark.sql.SparkSession

/** Factor-100 spot-check for a SERVING-family gate (round-12 verdict
  * item #7): the factor-100 sweep had covered the top-5 corpus-linear
  * queries; the serving claim ("fixed-cost artifacts + O(n) attach,
  * bounded-candidate scans") had no 100× point. This probe materializes
  * the documents/embeddings replicas of a scale dir (ScaleSweep's exact
  * perturbation rules, so dedup-structure and neighborhoods stay
  * base-like) and times registry gates at base vs replica: one UNTIMED
  * pass per (dir, gate) absorbs one-time artifact builds/fits exactly
  * like graft.Bench's pre-build block, then the record is the min of
  * `passes` timed runs of the SERVE path.
  *
  * Usage: `runMain graft.tools.ServeScaleProbe <baseDir> <factor>
  * <outDir> <gate1,gate2,...> [passes]`
  */
object ServeScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val out = args.lift(2).getOrElse(s"/tmp/graft_serve_sweep_f$factor")
    val gates = args.lift(3).map(_.split(",").toSeq)
      .getOrElse(Seq("s2_near_bq_approx"))
    val passes = args.lift(4).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // _SUCCESS, not bare dir existence: a crashed partial materialization
    // must rebuild, or the "100×" ratio silently measures a fraction of
    // the replicas (MeasureQps's corpus snapshot established the pattern)
    if (!Seq("documents", "embeddings").forall(t => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/$t.parquet/_SUCCESS")))) {
      println(s"[serve100] materializing documents+embeddings replicas at $out")
      ScaleSweep.build(spark, base, factor, out,
        tables = Some(Set("documents", "embeddings")))
    }
    val results = for (gate <- gates) yield {
      val fn = graft.SparkEntry.queries(gate)
      def timeAt(dir: String): Double = {
        fn(spark, dir).count() // untimed: artifact builds / quantizer fits
        val best = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        spark.catalog.clearCache()
        System.gc() // dead shuffle files free only on GC (ContextCleaner)
        best
      }
      val b = timeAt(base)
      val s = timeAt(out)
      println(f"[serve100] $gate%-28s base ${b}%6.2f s  f$factor ${s}%7.2f s  ratio ${s / b}%5.1f×")
      (gate, b, s)
    }
    results.foreach { case (g, b, s) =>
      println(f"[serve100:summary] $g ratio=${s / b}%.1f for ${factor}× data")
    }
    spark.stop()
  }
}
