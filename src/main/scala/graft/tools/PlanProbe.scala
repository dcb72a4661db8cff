package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-only probe for the high-D measurement points: reproduce the
  * corpus MeasureRecall feeds VamanaBuild (jlLift → replicatePerturbed)
  * and print the PHYSICAL plan of one NN-Descent round without running
  * it — the cheap way to see whether the vec-attach joins broadcast (the
  * harness conf's whole purpose) or fell back to a wide-row sort-merge,
  * which is the 50+ GB spill signature that aborted two 100k × 1536-d
  * runs. Usage: `runMain graft.tools.PlanProbe <sfDir> <factor> <dOut>`.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(50)
    val dOut = args.lift(2).map(_.toInt).getOrElse(1536)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (2048L << 20).toString)
      .config("spark.io.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb0 = graft.Tables.embeddings(spark, sfDir)
    val emb =
      if (dOut > 0)
        graft.operators.Embeddings.jlLift(
          emb0, col("vec_id"), col("embedding"), dIn = 64, dOut = dOut)
      else emb0
    val big = graft.operators.Embeddings.replicatePerturbed(
      emb, col("vec_id"), col("embedding"), factor, 0.05f)
    val vecs = big.select(col("vec_id").cast("long").as("id"),
      col("embedding").as("vec"))
    println(s"[probe] vecs plan stats: " +
      spark.sessionState.executePlan(vecs.queryExecution.logical)
        .optimizedPlan.stats.sizeInBytes)
    // one synthetic narrow pair set with the round's shape: the plan
    // decision (BHJ vs SMJ) depends on the vec side's stats, not the
    // pair side's contents
    val pairs = vecs.select(col("id").as("src"))
      .withColumn("dst", col("src") + 1)
    val joined = pairs
      .join(vecs.select(col("id").as("src"), col("vec").as("_sv")), "src")
      .join(vecs.select(col("id").as("dst"), col("vec").as("_dv")), "dst")
      .withColumn("_d", graft.functions.Distances.distance(
        graft.model.IndexKind.Metric.Euclidean, col("_sv"), col("_dv")))
      .select("src", "dst", "_d")
      .withColumn("_dr", org.apache.spark.sql.functions.dense_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("src").orderBy(col("_d").asc, col("dst").asc)))
    joined.explain("formatted")
    spark.stop()
  }
}
