package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** One-off stage-size diagnostic for the PPJoin pipeline at a scale
  * point: counts each stage and, crucially, computes the RAW
  * prefix-join fan-out (Σ over shingle of group², via a groupBy — no
  * join executed) so a candidate-generation blow-up can be attributed
  * to its shingle groups without writing the 10s-of-GB shuffle that
  * crashes the bench.
  *
  * Usage: `runMain graft.tools.ScaleDebug <docsDir> [threshold]`.
  */
object ScaleDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[dbg] docs: ${docs.count()}")
    val (base, cand) = Dedup.ngramJaccardStages(
      docs, col("doc_id"), col("text"), n = 3, threshold = threshold,
      maxShingleDf = None)
    println(s"[dbg] shingled docs: ${base.count()}")
    // THE operator's own prefix derivation (Dedup.prefixStage) — not a
    // copy, so the diagnostic can never drift from what PPJoin executes
    val (posts, prefix) = Dedup.prefixStage(base, threshold, maxShingleDf = None)
    println(s"[dbg] postings: ${posts.count()}")
    println(s"[dbg] prefix postings: ${prefix.count()}")
    val groups = prefix.groupBy("_s").agg(count(lit(1)).as("g"))
    val fanout = groups.agg(sum(col("g") * col("g"))).head().getLong(0)
    println(s"[dbg] raw prefix-join fan-out (sum g^2): $fanout")
    groups.orderBy(col("g").desc).limit(10).collect()
      .foreach(r => println(s"[dbg] top group: '${r.getString(0)}' g=${r.getLong(1)}"))
    println(s"[dbg] candidates after filters: ${cand.count()}")
    spark.stop()
  }
}
