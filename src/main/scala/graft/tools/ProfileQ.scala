package graft.tools

import org.apache.spark.sql.SparkSession

/** Temporary profiling harness: warm-runs one SparkEntry query 3×. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_ngram_jaccard")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[prof] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
