package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Scale smoke test: replicate the documents/embeddings corpus N× (ids
  * offset per replica) and time the heavy operators. The point is not the
  * absolute numbers but the SHAPE — every timing here should grow ~linearly
  * with the factor, because the quadratic-risk stages (near-dup pairing)
  * run behind exact dedup, which collapses the replicas first — the same
  * reason real corpus curation runs exact-dedup before near-dup.
  *
  *   sbt "runMain graft.tools.ScaleSmoke /root/testdata/sf0.1 10"
  */
object ScaleSmoke {

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def replicateDocs(docs: DataFrame, factor: Int, idStep: Long): DataFrame =
    docs.crossJoin(
        spark(docs).range(factor).select(col("id").as("_rep")))
      .withColumn("doc_id", col("doc_id") + col("_rep") * idStep)
      .drop("_rep")

  private def spark(df: DataFrame): SparkSession = df.sparkSession

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("scale-smoke").getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.documents(s, sfDir)
    val idStep = base.agg(max("doc_id")).head().getLong(0) + 1
    val docs = replicateDocs(base, factor, idStep).persist()
    val n = time("replicate + materialize")(docs.count())
    println(s"[scale] corpus: $n docs (factor $factor)")

    time("vocabulary (groupBy token)")(
      TextAnalysis.vocabulary(docs, col("doc_id"), col("text"), minCount = 5L)
        .limit(200).count())
    time("exact-dup stats (hash groupBy)")(
      Dedup.exactStats(docs, col("text")).count())
    time("langid + quality (one pass)")(
      TextAnalysis.quality(docs, col("doc_id"), col("text")).count())
    time("minhash signatures")(
      Dedup.minhashSigArrays(docs, col("doc_id"), col("text")).count())
    time("winnow sketch (rolling hash)")(
      TextAnalysis.winnow(docs, col("doc_id"), col("text")).count())
    time("feature extract (payload histogram)")(
      graft.operators.Multimodal.featureExtract(
        graft.operators.Multimodal.withPayload(
          docs, col("doc_id"), col("text"), "image/fake"), dim = 32).count())

    // curation shape: exact dedup FIRST (collapses the replicas), then the
    // pairing stages run over the canonical set — linear in the factor up
    // to here, constant after
    val canon = docs.join(
      docs.groupBy(md5(col("text")).as("_k")).agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id"),
      Seq("doc_id"), "left_semi").persist()
    time("exact dedup -> canonical set")(canon.count())
    // count INSIDE the timed block — plan construction and persist() are
    // lazy; the join/verify work only runs at the action
    val pairs = Dedup.ngramJaccardPairs(canon, col("doc_id"), col("text"),
      n = 3, threshold = 0.5).persist()
    val nPairs = time("ngram-jaccard pairs on canon")(pairs.count())
    println(s"[scale] near-dup pairs: $nPairs")
    // driverLimit = 0: measure the DISTRIBUTED star rounds — the smoke
    // exists to time the path that runs when edges outgrow the driver
    time("connected components (distributed)")(
      Dedup.connectedComponents(pairs, col("id_a"), col("id_b"), driverLimit = 0).count())

    docs.unpersist(); canon.unpersist(); pairs.unpersist()
    s.stop()
  }
}
