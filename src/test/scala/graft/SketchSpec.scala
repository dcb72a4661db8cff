package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sketches}

/** Count–min sketch laws on hand-built corpora: one-sided error
  * (estimate never under-counts), exactness when no row collides,
  * deterministic output, bounded sketch size, and heavy-hitter
  * recovery on a skewed distribution.
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  // skewed corpus: item i appears count(i) times, heavily separated head
  private lazy val corpus = (
    Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(200)("gamma") ++
      (0 until 100).flatMap(i => Seq.fill(3)(s"tail$i"))
  ).toDF("it")

  test("estimates never under-count, and are exact at collision-free width") {
    val exact = corpus.groupBy("it").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // width 1<<16 over 103 distinct items: every item almost surely owns
    // a private bucket in at least one of 4 rows (verified by the exact
    // assertion below — deterministic, not probabilistic, once it holds)
    val est = Sketches.cmsEstimate(
      Sketches.countMinSketch(corpus, col("it"), width = 1 << 16, depth = 4),
      corpus, col("it"), width = 1 << 16, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, v) =>
      assert(est(k) == v, s"collision-free estimate must be exact: $k ${est(k)} vs $v")
    }
  }

  test("tiny width inflates (one-sided) but never drops below truth") {
    val exact = corpus.groupBy("it").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 103 distinct items into 16 buckets: collisions guaranteed
    val est = Sketches.cmsEstimate(
      Sketches.countMinSketch(corpus, col("it"), width = 16, depth = 4),
      corpus, col("it"), width = 16, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, v) =>
      assert(est(k) >= v, s"CMS must never under-count: $k ${est(k)} < $v")
    }
    assert(exact.exists { case (k, v) => est(k) > v },
      "16 buckets for 103 items must collide somewhere")
  }

  test("null candidates are excluded — no spurious estimate from a seed-only hash") {
    val withNulls = (Seq.fill(100)("a") ++ Seq[String](null, null)).toDF("it")
    // tiny width forces collisions: an unfiltered null would land in a
    // real cell and report its count
    val top = Sketches.heavyHitters(withNulls, col("it"), width = 4, depth = 2, k = 5)
      .collect().map(r => Option(r.getString(0)))
    assert(top.flatten.length == top.length && top.flatten.toSeq == Seq("a"),
      s"null must never appear as a heavy hitter: ${top.toSeq}")
  }

  test("sketch size is bounded by depth x width regardless of corpus size") {
    val sketch = Sketches.countMinSketch(corpus, col("it"), width = 16, depth = 4)
    assert(sketch.count() <= 16L * 4)
    // total mass per row d = corpus size (each item lands once per row)
    val mass = sketch.groupBy("d").agg(sum("cnt").as("m")).collect()
      .map(r => r.getLong(1)).distinct.toSeq
    assert(mass == Seq(corpus.count()), s"each row must hold the full mass: $mass")
  }

  test("heavy hitters recover the separated head in order") {
    val top = Sketches.heavyHitters(corpus, col("it"), width = 1 << 16, depth = 4, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("alpha", 500L), ("beta", 300L), ("gamma", 200L)), top.toString)
  }

  test("deterministic under re-evaluation and layout changes") {
    val a = Sketches.countMinSketch(corpus, col("it"), 64, 4)
      .orderBy("d", "bucket").collect().toSeq
    val b = Sketches.countMinSketch(corpus.repartition(7), col("it"), 64, 4)
      .orderBy("d", "bucket").collect().toSeq
    assert(a == b, "sketch must be a pure function of the corpus multiset")
  }

  test("randomized: one-sided law and per-row mass hold on arbitrary corpora") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(300)
      val items = (0 until n).map(_ => s"w${rnd.nextInt(30 + rnd.nextInt(40))}")
      val df = items.toDF("it")
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val (w, dep) = (8 + rnd.nextInt(56), 1 + rnd.nextInt(4))
      val sketch = Sketches.countMinSketch(df, col("it"), w, dep)
      val est = Sketches.cmsEstimate(sketch, df, col("it"), w, dep)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.keySet == exact.keySet, s"seed=$seed candidates")
      exact.foreach { case (k, v) =>
        assert(est(k) >= v, s"seed=$seed: under-count at $k (${est(k)} < $v)")
      }
      val mass = sketch.groupBy("d").agg(sum("cnt")).collect()
        .map(_.getLong(1)).distinct.toSeq
      assert(mass == Seq(n.toLong), s"seed=$seed mass $mass != $n")
    }
  }

  test("sketch aggregation runs unchanged under Structured Streaming") {
    def items(ev: org.apache.spark.sql.DataFrame) =
      ev.select(col("user_id").cast("string").as("item"))
    val batch = Sketches.countMinSketch(
      items(Tables.events(spark, sf0001)), col("item"), 1024, 4)
      .orderBy("d", "bucket").collect().toSeq
    val streamed = graft.streaming.EventsStream.runAsStream(spark, sf0001,
      ev => Sketches.countMinSketch(items(ev), col("item"), 1024, 4),
      outputMode = "complete")
      .orderBy("d", "bucket").collect().toSeq
    assert(batch.nonEmpty && streamed == batch,
      s"streamed sketch must be cell-identical to batch (${streamed.length} vs ${batch.length} cells)")
  }

  test("composes with the shared tokenizer over real documents") {
    val docs = Tables.documents(spark, sf0001)
    val toks = docs.select(explode(Dedup.tokens(col("text"))).as("tok"))
    val exactTop = toks.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val cmsTop = Sketches.heavyHitters(toks, col("tok"), width = 1 << 20, depth = 4, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(cmsTop == exactTop,
      s"at 2^20 width the head estimates are exact: $cmsTop vs $exactTop")
  }
}
