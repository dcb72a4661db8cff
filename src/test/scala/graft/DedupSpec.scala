package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The testdata plants 25 near-duplicate document pairs; every near-dup
  * method must surface them (and agree with each other).
  */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("null-text rows pass through every shingle-based operator") {
    val nullDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val pairs = Dedup.ngramJaccardPairs(
      nullDocs, col("id"), col("text"), n = 3, threshold = 0.5).collect()
    assert(pairs.length == 1) // docs 1/2 pair; the null row is skipped
    val sigs = Dedup.minhashSigArrays(
      nullDocs, col("id"), col("text")).collect()
    assert(sigs.length == 2)
  }

  lazy val docs = Tables.documents(spark, sf001)

  lazy val exactPairs: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("ngram jaccard finds the 25 planted near-dup pairs, all ≈0.98") {
    val rows = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.5))
    assert(rows.count(_.getAs[Double]("jaccard") > 0.9) >= 20)
  }

  test("minhash LSH recovers the same pairs with est ≈ jaccard") {
    val sigs = Dedup.minhashSigArrays(docs, col("doc_id"), col("text"))
    val pairs = Dedup.minhashLshPairs(sigs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == exactPairs)
  }

  test("simhash of planted pairs is within small hamming distance") {
    val sims = Dedup.simhash(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    exactPairs.foreach { case (a, b) =>
      val dist = java.lang.Long.bitCount(sims(a) ^ sims(b))
      assert(dist <= 10, s"pair ($a,$b) hamming $dist")
    }
    // random non-dup pairs should be far apart
    val ids = sims.keys.toSeq.sorted.take(20)
    val far = for {
      a <- ids; b <- ids
      if a < b && !exactPairs.contains((a, b))
    } yield java.lang.Long.bitCount(sims(a) ^ sims(b))
    assert(far.count(_ > 10) > far.length / 2)
  }

  test("exact stats: all sf0.01 docs distinct") {
    val r = Dedup.exactStats(docs, col("text")).head()
    assert(r.getAs[Long]("n_total") == 500L)
    assert(r.getAs[Long]("n_distinct") == 500L)
    assert(r.getAs[Long]("n_dup_groups") == 0L)
  }

  test("embedding cosine pairs respect the blocking column") {
    val emb = Tables.embeddings(spark, sf001)
    val rows = Dedup.embeddingCosinePairs(emb, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.3).collect()
    assert(rows.nonEmpty)
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("id_a")) == labels(r.getAs[Long]("id_b")))
      assert(r.getAs[Double]("cosine_sim") >= 0.3)
    }
  }

  test("maxShingleDf skew guard drops stop-shingles but keeps strong pairs") {
    val guarded = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.5, maxShingleDf = Some(50)).collect()
    // planted pairs share rare shingles, so the guard keeps them
    assert(guarded.length == 25)
  }
}
