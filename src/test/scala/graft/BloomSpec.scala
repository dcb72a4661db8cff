package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomDedup

/** Laws for the sharded Bloom novelty check: no false negatives (exact),
  * false-positive rate inside the sized band, layout independence of the
  * filter, the empty-corpus behavior, and the input guards.
  */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private val N = 2000

  private def corpus = (0 until N).map(i => (i.toLong, s"corpus-key-$i"))
    .toDF("id", "key")

  test("no false negatives: every corpus key probes seen") {
    val flags = BloomDedup.noveltyAgainst(
      corpus, col("key"), corpus, col("id"), col("key"),
      expectedItems = N, fpp = 0.01, buckets = 32)
    assert(flags.count() === N)
    assert(flags.filter(!col("probably_seen")).count() === 0)
  }

  test("false-positive rate on disjoint probes stays inside the sized band") {
    val probes = (0 until N).map(i => (i.toLong, s"novel-key-$i")).toDF("id", "key")
    val flags = BloomDedup.noveltyAgainst(
      corpus, col("key"), probes, col("id"), col("key"),
      expectedItems = N, fpp = 0.01, buckets = 32)
    val fp = flags.filter(col("probably_seen")).count()
    // expected ~N·fpp = 20; 5× headroom keeps the law sharp but unflaky
    assert(fp <= (N * 0.05).toLong, s"observed $fp false positives out of $N")
  }

  test("filter is a pure function of the corpus multiset (layout independence)") {
    val a = BloomDedup.build(corpus, col("key"), N, 0.01, 16)
      .map { case (b, buf) => (b, buf.words.toSeq.hashCode) }
      .collect().toMap
    val b = BloomDedup.build(corpus.repartition(13, col("key")).sortWithinPartitions(desc("id")),
        col("key"), N, 0.01, 16)
      .map { case (b2, buf) => (b2, buf.words.toSeq.hashCode) }
      .collect().toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("empty corpus answers novel for every probe; null keys are skipped") {
    val empty = Seq.empty[(Long, String)].toDF("id", "key")
    val probes = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("id", "key")
    val flags = BloomDedup.noveltyAgainst(
      empty, col("key"), probes, col("id"), col("key"), 10, 0.01, 4)
    assert(flags.as[(Long, Boolean)].collect().toSeq === Seq((1L, false)))
  }

  test("guards: sizing inputs and non-numeric id rejected") {
    intercept[IllegalArgumentException](BloomDedup.sizing(0, 0.01, 4))
    intercept[IllegalArgumentException](BloomDedup.sizing(10, 1.5, 4))
    intercept[IllegalArgumentException](BloomDedup.sizing(10, 0.01, 0))
    val strId = Seq(("a", "k")).toDF("id", "key")
    intercept[IllegalArgumentException](
      BloomDedup.noveltyAgainst(corpus, col("key"), strId, col("id"), col("key"), 10, 0.01, 4))
  }

  test("sizing: more bits per key -> more hashes, never zero") {
    val (w1, k1) = BloomDedup.sizing(1000, 0.01, 8)
    val (w2, k2) = BloomDedup.sizing(1000, 0.0001, 8)
    assert(w2 > w1 && k2 > k1 && k1 >= 1)
  }

  test("sizing: oversized shards raise a clear error instead of saturating to Int") {
    // 10^10 keys at fpp 1e-9 in ONE bucket needs ~10^12 bits - the Long
    // sizing path must refuse with the raise-buckets hint, not mis-size
    val ex = intercept[IllegalArgumentException](
      BloomDedup.sizing(10_000_000_000L, 1e-9, 1))
    assert(ex.getMessage.contains("raise `buckets`"), ex.getMessage)
    // the same load spread over enough buckets sizes fine
    val (w, k) = BloomDedup.sizing(10_000_000_000L, 1e-9, 4096)
    assert(w > 0 && k >= 1)
  }
}
