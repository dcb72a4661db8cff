package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: print the ANALYZED and OPTIMIZED logical plans for
  * named registry queries (the physical dump in DumpPlans shows WHAT was
  * planned; this shows what the optimizer saw and produced, which is the
  * evidence needed to explain a missing TakeOrderedAndProject fusion).
  * Usage: runMain graft.tools.ProbeLogical <name> [name...]
  */
object ProbeLogical {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name ANALYZED =====")
      println(df.queryExecution.analyzed.treeString)
      println(s"===== $name OPTIMIZED =====")
      println(df.queryExecution.optimizedPlan.treeString)
    }
    spark.stop()
  }
}
