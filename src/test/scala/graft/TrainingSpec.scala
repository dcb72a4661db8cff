package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Packing, Sampling, TextAnalysis}

/** Specs for the training-shard operators: sequence packing (distributed
  * prefix sum), deterministic sampling, and repetition filters.
  */
class TrainingSpec extends SparkSuite {
  import spark.implicits._

  // ---- Packing ------------------------------------------------------------

  test("packing: offsets are the prefix sum, independent of partition count") {
    val docs = (1L to 97L).map(i => (i, (i * 7 % 13) + (if (i % 5 == 0) 0L else 1L)))
    val df = docs.toDF("id", "w")
    def run(p: Int): Seq[(Long, Long, Long)] =
      Packing.withStartOffsets(df, col("id"), col("w"), partitions = p)
        .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val at2 = run(2)
    val at7 = run(7)
    val at32 = run(32) // more partitions than natural input splits
    assert(at2 == at7 && at7 == at32)
    // ground truth: sequential cumsum
    var acc = 0L
    val expected = docs.sortBy(_._1).map { case (i, w) =>
      val r = (i, w, acc); acc += w; r
    }
    assert(at2 == expected)
  }

  test("packing: chunk spans cover the weights at the declared capacity") {
    val df = Seq((1L, 10L), (2L, 250L), (3L, 0L), (4L, 600L), (5L, 1L))
      .toDF("id", "w")
    val rows = Packing.packChunks(df, col("id"), col("w"), capacity = 256)
      .orderBy("id").collect()
    rows.foreach { r =>
      val (w, start, first, last, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(first == start / 256)
      assert(last == (start + math.max(w, 1) - 1) / 256)
      assert(n == last - first + 1)
    }
    // doc 4 (600 tokens) must span at least 3 chunks
    assert(rows.find(_.getLong(0) == 4L).get.getLong(5) >= 3)
  }

  test("packing: random weight sweeps match sequential cumsum at any partition count") {
    val rnd = new scala.util.Random(42) // fixed seed — deterministic sweep
    for (_ <- 1 to 3) {
      val n = 40 + rnd.nextInt(80)
      // mix of zeros, small, and large weights; non-contiguous ids
      val docs = (1 to n).map { i =>
        val w = rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => rnd.nextInt(5).toLong
          case _ => rnd.nextInt(100000).toLong
        }
        (i.toLong * 3 + rnd.nextInt(2), w)
      }.distinctBy(_._1)
      val df = docs.toDF("id", "w")
      var acc = 0L
      val expected = docs.sortBy(_._1).map { case (i, w) =>
        val r = (i, w, acc); acc += w; r
      }
      for (p <- Seq(1, 5, 16)) {
        val got = Packing.withStartOffsets(df, col("id"), col("w"), partitions = p)
          .orderBy("id").as[(Long, Long, Long)].collect().toSeq
        assert(got == expected, s"partitions=$p")
      }
    }
  }

  test("packing: null ids fail fast with a named error") {
    val df = Seq((Option(1L), 5L), (Option.empty[Long], 3L)).toDF("id", "w")
    val e = intercept[Exception] {
      Packing.withStartOffsets(df, col("id"), col("w")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("non-null numeric id")))
  }

  test("packing: negative weights are rejected") {
    val df = Seq((1L, 5L), (2L, -1L)).toDF("id", "w")
    val e = intercept[org.apache.spark.SparkException] {
      Packing.withStartOffsets(df, col("id"), col("w")).collect()
    }
    assert(e.getMessage != null)
  }

  // ---- Sampling -----------------------------------------------------------

  test("sampling: decisions are a pure row property (stable across runs and layouts)") {
    val df = (0L until 2000L).toDF("id")
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.bernoulli(d, col("id"), 0.3).as[Long].collect().toSet
    val a = ids(df)
    val b = ids(df.repartition(13))
    assert(a == b)
    // roughly the declared rate (2000 draws, tolerance generous)
    assert(a.size > 450 && a.size < 750)
  }

  test("sampling: lower rates select subsets of higher rates; salt changes the draw") {
    val df = (0L until 2000L).toDF("id")
    val lo = Sampling.bernoulli(df, col("id"), 0.2).as[Long].collect().toSet
    val hi = Sampling.bernoulli(df, col("id"), 0.6).as[Long].collect().toSet
    assert(lo.subsetOf(hi))
    val other = Sampling.bernoulli(df, col("id"), 0.2, salt = "other")
      .as[Long].collect().toSet
    assert(lo != other)
  }

  test("sampling: stratified applies each stratum's rate (null stratum takes default)") {
    val df = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else null))
      .toDF("id", "lang")
    val out = Sampling.stratified(df, col("id"), col("lang"),
      rates = Map("en" -> 1.0, "de" -> 0.0), defaultRate = 0.5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // rate 1.0 keeps all but ~1/2^32; rate 0.0 keeps none
    assert(byLang(Some("en")) == 1000L)
    assert(!byLang.contains(Some("de")))
    val nullKept = byLang.getOrElse(None, 0L)
    assert(nullKept > 350 && nullKept < 650)
  }

  test("sampling: mixSources hits target shares, caps over-budgeted sources") {
    // three sources, 1000 rows of weight 10 each (available = 10000/source)
    val df = (0L until 3000L).map(i => (i, s"s${i % 3}", 10L))
      .toDF("id", "src", "w")
    // budget 12000 at shares 50/25/25 -> s0 wants 6000 of 10000 (rate .6),
    // s1/s2 want 3000 (rate .3); unlisted sources would get rate 0
    val out = Sampling.mixSources(df, col("id"), col("src"), col("w"),
      shares = Map("s0" -> 0.5, "s1" -> 0.25, "s2" -> 0.25), budget = 12000.0)
    val kept = out.groupBy("src")
      .agg(sum("w").as("kw"), max("mix_rate").as("r"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(kept("s0")._2 == 0.6 && kept("s1")._2 == 0.3)
    // kept weight tracks budget*share (binomial tolerance, n=1000)
    assert(math.abs(kept("s0")._1 - 6000L) < 900)
    assert(math.abs(kept("s1")._1 - 3000L) < 900)
    // over-budget: s0 asked for 3x its availability -> capped at 1.0, all kept
    val capped = Sampling.mixSources(df, col("id"), col("src"), col("w"),
      shares = Map("s0" -> 1.0), budget = 30000.0)
    val s0 = capped.agg(sum("w"), max("mix_rate")).head()
    assert(s0.getLong(0) == 10000L && s0.getDouble(1) == 1.0)
    // layout independence: the kept id set is a pure row property
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.mixSources(df.repartition(11), col("id"), col("src"),
        col("w"), Map("s0" -> 0.5, "s1" -> 0.25, "s2" -> 0.25), 12000.0)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  // ---- Repetition ---------------------------------------------------------

  test("repetition: duplicate grams, top-gram share, and line repeats") {
    val df = Seq(
      (1L, "a b a b a b"),          // 2-grams: ab ba ab ba ab; 3-grams: aba bab aba bab
      (2L, "x\nx\n \ny"),           // lines: x, x, y (blank dropped)
      (3L, "one"),                  // too short for grams
      (4L, "w1 w2 w3 w4")           // all distinct
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df, col("doc_id"), col("text"))
      .orderBy("id").collect()

    val d1 = out(0)
    assert(math.abs(d1.getDouble(3) - 0.6) < 1e-9)  // dup_2gram_frac: 1 - 2/5
    assert(math.abs(d1.getDouble(4) - 0.6) < 1e-9)  // top_2gram_frac: 3/5 ("a b")
    assert(math.abs(d1.getDouble(5) - 0.5) < 1e-9)  // dup_3gram_frac: 1 - 2/4

    val d2 = out(1)
    assert(d2.getLong(1) == 3L)                      // n_lines
    assert(math.abs(d2.getDouble(2) - (1.0 - 2.0 / 3.0)) < 1e-9)

    val d3 = out(2)                                  // no grams → 0.0, not null
    assert(d3.getDouble(3) == 0.0 && d3.getDouble(4) == 0.0 && d3.getDouble(5) == 0.0)

    val d4 = out(3)                                  // distinct grams → 0 dup, top = 1/3
    assert(d4.getDouble(3) == 0.0)
    assert(math.abs(d4.getDouble(4) - 1.0 / 3.0) < 1e-9)
  }

  test("repetition: null text is dropped; single row schema is stable") {
    val df = Seq((1L, "a a a"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df, col("doc_id"), col("text")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }

  test("shuffleShards: every row assigned, layout-independent, salts are epochs") {
    val docs = Tables.documents(spark, sf001)
    val n = docs.count()
    val out = Sampling.shuffleShards(docs, col("doc_id"), numShards = 8)
    assert(out.count() == n)
    assert(out.groupBy("shard").count().count() == 8)
    // multinomial balance: every shard within 3x of fair share on 500 docs
    val sizes = out.groupBy("shard").count().select("count")
      .collect().map(_.getLong(0))
    assert(sizes.min > n / 24 && sizes.max < n / 2)
    // pure row property: a different partition layout assigns identically
    val out5 = Sampling.shuffleShards(docs.repartition(5), col("doc_id"), numShards = 8)
    assert(out5.select("doc_id", "shard", "sort_key").orderBy("doc_id").collect().toSeq ==
      out.select("doc_id", "shard", "sort_key").orderBy("doc_id").collect().toSeq)
    // a new salt is an independent epoch: same rows, different order
    val e2 = Sampling.shuffleShards(docs, col("doc_id"), numShards = 8, salt = "epoch2")
    val k1 = out.orderBy("sort_key").select("doc_id").collect().map(_.getLong(0)).toSeq
    val k2 = e2.orderBy("sort_key").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(k1.toSet == k2.toSet && k1 != k2)
  }

  test("packGreedy: hand fixture — first-fit bins, oversized alone, group reset") {
    import spark.implicits._
    val docs = Seq(
      (0L, 1L, 4L), (0L, 2L, 5L), (0L, 3L, 3L), (0L, 4L, 10L), (0L, 5L, 2L),
      (1L, 6L, 15L), // oversized: own bin
      (1L, 7L, 0L))  // zero-weight at position 2
      .toDF("grp", "id", "w")
    val out = Packing.packGreedy(docs, col("grp"), col("id"), col("id"),
        col("w"), capacity = 10L)
      .orderBy("group", "id")
      .select("group", "id", "bin", "pos").as[(Long, Long, Long, Long)]
      .collect().toSeq
    assert(out === Seq(
      (0L, 1L, 0L, 0L), (0L, 2L, 0L, 1L), // 4+5=9 fits
      (0L, 3L, 1L, 0L),                   // 12 > 10 -> new bin
      (0L, 4L, 2L, 0L),                   // 10 fills a bin alone
      (0L, 5L, 3L, 0L),
      (1L, 6L, 0L, 0L),                   // group reset; oversized alone
      (1L, 7L, 1L, 0L)))                  // 15+0 > 10 -> next bin
  }

  test("packGreedy: invariants on real data + layout independence") {
    val docs = Tables.documents(spark, sf001).filter(col("text").isNotNull)
      .select(col("doc_id"), (col("doc_id") % 5).as("grp"),
        org.apache.spark.sql.functions.size(
          graft.operators.Dedup.tokens(col("text"))).cast("long").as("w"))
    val a = Packing.packGreedy(docs, col("grp"), col("doc_id"), col("doc_id"),
      col("w"), capacity = 300L)
    // no bin exceeds capacity unless it holds exactly one oversized doc
    val over = a.groupBy("group", "bin")
      .agg(sum("w").as("tw"), count(lit(1)).as("n"))
      .filter(col("tw") > 300L && col("n") > 1L)
    assert(over.count() === 0)
    // every doc appears exactly once
    assert(a.count() === docs.count())
    val b = Packing.packGreedy(docs.repartition(13, col("doc_id")),
      col("grp"), col("doc_id"), col("doc_id"), col("w"), capacity = 300L)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    intercept[IllegalArgumentException](
      Packing.packGreedy(docs, col("grp"), col("doc_id"), col("doc_id"), col("w"), 0L))
  }

  test("exact 13-gram decontamination: shared run flags, disjoint text does not") {
    import org.apache.spark.sql.functions._
    val shared = (1 to 13).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, s"eval doc begins $shared and ends here", true),
      (2L, s"train doc carries $shared plus its own tail words", false),
      (3L, "a completely different training document with no overlap at all " +
        "padded out to well over thirteen distinct tokens of text", false),
      (4L, "short train doc", false) // < 13 tokens: no grams, no row
    ).toDF("id", "text", "is_eval")
    val out = graft.operators.TextAnalysis.ngramContamination(
        df, col("id"), col("text"), col("is_eval"), n = 13)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId.keySet == Set(2L, 3L), byId.keySet) // eval + short docs excluded
    assert(byId(2L).getLong(2) >= 1, byId(2L))      // the shared run hits
    assert(byId(3L).getLong(2) == 0)
    assert(byId(3L).getDouble(3) == 0.0)
    // layout independence: identical under a different partitioning
    val again = graft.operators.TextAnalysis.ngramContamination(
        df.repartition(7), col("id"), col("text"), col("is_eval"), n = 13)
      .orderBy("id").collect()
    assert(again.toSeq == out.toSeq)
  }
}
