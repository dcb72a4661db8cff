package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the EXECUTED (post-AQE) physical plan for named registry queries —
  * the runtime-evidence sibling of [[DumpPlans]] (round-12 verdict item:
  * the 8 SMJ gates' conversion to shuffled-hash is an AQE *runtime*
  * rewrite, invisible in the initial plan `DumpPlans` prints).
  *
  * Usage: `runMain graft.tools.DumpExecutedPlans <outDir> <suffix> <name>...`
  * builds each query, EXECUTES it through the noop sink (guide §1.4 — every
  * column of every row computed, nothing collected), then writes
  * `<outDir>/<name>_<suffix>.txt` containing the final adaptive plan
  * (`executedPlan` after the action, `isFinalPlan=true` subtrees included).
  * The session mirrors graft.Bench exactly (same env contract, same
  * join-strategy defaults) so the dumped plans are the plans the bench
  * executes at runtime.
  */
object DumpExecutedPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpExecutedPlans <outDir> <suffix> <name>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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
          spark.sparkContext.setJobDescription(s"executed-plan: $name")
          df.write.format("noop").mode("overwrite").save()
          // after the action the adaptive root reports its FINAL plan
          df.queryExecution.executedPlan.toString
        } catch {
          case e: Throwable => s"RUN FAILED: $e"
        } finally spark.sparkContext.setJobDescription(null)
      java.nio.file.Files.write(
        outDir.resolve(s"${name}_$suffix.txt"),
        (s"== $name ($suffix, sf=$sfDir, cpus=$cpus, executed) ==\n" + body)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plans] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
