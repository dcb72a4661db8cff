package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named registry queries to files —
  * the round-record evidence for plan-shape claims (plans/r<N>/...).
  *
  * Usage: `runMain graft.tools.DumpPlans <outDir> <suffix> <name> [name ...]`
  * writes `<outDir>/<name>_<suffix>.txt` per query. The session mirrors
  * graft.Bench (same master/shuffle-partition/timezone shape via
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS) so the dumped plans are the
  * bench's plans. Queries whose build fails still produce a file with
  * the error, so a dump over a historical commit can't silently skip a
  * gate that doesn't exist there.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <suffix> <name>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same default as graft.Bench ("4"): shuffle-partition count feeds
    // join-strategy and AQE decisions, so a diverging default would
    // silently dump plans the bench never executes (round-12 advice) —
    // round records set SPARK_GRAFT_CPUS explicitly to the bench shape
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror graft.Bench's join-strategy defaults: dumped plans must be
      // the plans the bench executes
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "64m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val registry = graft.SparkEntry.queries
    names.foreach { name =>
      val body =
        try {
          val df = registry(name)(spark, sfDir)
          df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        } catch {
          case e: Throwable => s"BUILD FAILED: $e"
        }
      java.nio.file.Files.write(
        outDir.resolve(s"${name}_$suffix.txt"),
        (s"== $name ($suffix, sf=$sfDir, cpus=$cpus) ==\n" + body)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plans] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
