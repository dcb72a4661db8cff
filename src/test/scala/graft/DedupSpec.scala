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

  test("winnowing pairs recover nearly all planted near-dups from a reduced sketch") {
    import graft.operators.TextAnalysis
    val sketch = TextAnalysis.winnow(docs, col("doc_id"), col("text"), n = 3, window = 4)
    val pairs = TextAnalysis.winnowPairs(sketch, minShared = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ≈0.98-jaccard pairs share almost all sketch hashes; a pair can drop
    // only when its few edits straddle the sampled windows
    assert(pairs.intersect(exactPairs).size >= 23,
      s"winnow found ${pairs.intersect(exactPairs).size}/25 planted pairs")
    // and the sketch join really is smaller than the gram postings —
    // winnowing's expected density is 2/(w+1) = 40% of grams at w=4
    val sketchRows = sketch.count()
    val gramRows = docs.select(explode(Dedup.shinglesFromTokens(
      Dedup.tokens(col("text")), 3))).count()
    assert(sketchRows * 2 < gramRows,
      s"sketch $sketchRows not a reduction of $gramRows grams")
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

  test("connected components: chains, merges, and star stability (both paths)") {
    // chain 1-2-3-4 (transitivity beyond direct pairs), triangle {10,11,12},
    // v-merge {20,21}+{20,22}, isolated edge {30,31}; ids deliberately NOT
    // in discovery order
    val edges = Seq(
      (3L, 2L), (1L, 2L), (4L, 3L),
      (11L, 10L), (12L, 11L), (10L, 12L),
      (21L, 20L), (22L, 20L),
      (31L, 30L)).toDF("a", "b")
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)
    // driver union-find fast path
    val fast = Dedup.connectedComponents(edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(fast == expected)
    // distributed large-star/small-star path (driverLimit = 0 forces it)
    val dist = Dedup.connectedComponents(edges, col("a"), col("b"), driverLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(dist == expected)
  }

  test("connected components work over string ids (lexicographic min)") {
    val edges = Seq(("doc9", "doc10"), ("doc10", "doc2")).toDF("a", "b")
    val comp = Dedup.connectedComponents(edges, col("a"), col("b"))
      .as[(String, String)].collect().toMap
    // min is LEXICOGRAPHIC for strings: "doc10" < "doc2" < "doc9"
    assert(comp == Map("doc9" -> "doc10", "doc10" -> "doc10", "doc2" -> "doc10"))
  }

  test("connected components over the planted pairs label by min doc id") {
    val comp = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), n = 3, threshold = 0.5),
      col("id_a"), col("id_b")).as[(Long, Long)].collect().toMap
    // every planted pair lands in one component labeled by its min id
    exactPairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b))
      assert(comp(a) <= math.min(a, b))
    }
    // components partition exactly the nodes incident to pairs
    assert(comp.keySet == exactPairs.flatMap(p => Seq(p._1, p._2)))
  }

  test("lineDedup: recurring boilerplate lines vanish, unique lines keep order") {
    val boiler = "accept all cookies to continue"
    val df = Seq(
      (1L, s"alpha one\n$boiler\nalpha two"),
      (2L, s"$boiler\nbeta solo\n\n  \nbeta tail"),
      (3L, boiler), // boilerplate-only doc: everything dropped
      (4L, "gamma a\ngamma a\ngamma b")) // in-doc repeat counts toward df
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, col("doc_id"), col("text"), maxDf = 1L)
      .orderBy("id").collect()
    // doc 1: boilerplate (df=3) dropped, order preserved
    assert(out(0).getLong(1) == 3 && out(0).getLong(2) == 2)
    assert(out(0).getString(3) == "alpha one\nalpha two")
    // doc 2: blank lines never counted (n_lines = 3 non-blank)
    assert(out(1).getLong(1) == 3 && out(1).getString(3) == "beta solo\nbeta tail")
    // doc 3: all lines dropped -> n_kept 0, NULL text
    assert(out(2).getLong(2) == 0 && out(2).isNullAt(3))
    // doc 4: "gamma a" occurs twice globally (both in doc 4) -> df 2 > maxDf
    assert(out(3).getLong(2) == 1 && out(3).getString(3) == "gamma b")
    // maxDf=3 re-admits the boilerplate everywhere
    val loose = Dedup.lineDedup(df, col("doc_id"), col("text"), maxDf = 3L)
      .orderBy("id").collect()
    assert(loose(2).getString(3) == boiler)
  }

  test("semDedup: dominated-by-earlier-id policy, cells never compared across") {
    // planar vectors 2° apart: cos(2°)=0.99939 ≥ τ=0.999 > cos(4°)=0.99756,
    // so 1~2 and 2~3 pair but 1~3 does not — a chain; 4 orthogonal to all;
    // 5 duplicates 1 but sits in another cell
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
    }
    val df = Seq(
      (1L, v(0), 0),
      (2L, v(2), 0),
      (3L, v(4), 0),
      (4L, Array(0f, 0f, 1f, 0f), 0),
      (5L, v(0.01), 1)).toDF("id", "vec", "cell")
    val out = Dedup.semDedup(df, col("id"), col("vec"), col("cell"), tau = 0.999)
      .orderBy("id").collect()
    assert(out.length == 5) // every input doc comes back
    val kept = out.filter(_.getAs[Boolean]("kept")).map(_.getLong(0)).toSet
    // 1 is the min-id representative; 2 dominated by 1; 3 dominated by 2
    // even though cos(1,3) < tau — the documented chain behavior of
    // dominated-by-ANY-earlier (a sequential greedy would keep 3)
    assert(kept == Set(1L, 4L, 5L))
    // drop_sim is the max dominating similarity, null on kept rows
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getAs[Double]("drop_sim") > 0.999)
    assert(out.filter(_.getAs[Boolean]("kept")).forall(_.isNullAt(3)))
  }

  test("semDedup over sf0.01 embeddings: sign-cells, every doc accounted for") {
    val emb = Tables.embeddings(spark, sf001)
    val out = Dedup.semDedup(emb, col("vec_id"), col("embedding"),
      graft.operators.Similarity.signBucket(col("embedding"), 6), tau = 0.3)
    val n = emb.count()
    assert(out.count() == n)
    val dropped = out.filter(!col("kept")).count()
    assert(dropped > 0, "tau=0.3 must drop some same-cell neighbors on this corpus")
    assert(dropped < n, "must keep at least the per-cell representatives")
    // layout independence: a different split yields the identical verdict set
    val out7 = Dedup.semDedup(emb.repartition(7), col("vec_id"), col("embedding"),
      graft.operators.Similarity.signBucket(col("embedding"), 6), tau = 0.3)
    val a = out.select("id", "kept").orderBy("id").collect().toSeq
    val b = out7.select("id", "kept").orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("substringDupStats: coverage is the interval union of duplicated windows") {
    // n=3 windows; hand-computed fixture:
    //  - docs 1 and 2 share the 5-token run "a b c d e" → windows at
    //    starts 1..3 are duplicated in both; coverage = union of
    //    [1,3][2,4][3,5] = 5 tokens
    //  - doc 3 repeats "x y z" twice (intra-doc dup, non-adjacent):
    //    "x y z p q x y z" → "x y z" at starts 1 and 6 duplicate;
    //    coverage = [1,3] ∪ [6,8] = 6 of 8 tokens (disjoint intervals)
    //  - doc 4 is all-unique → zero dup windows
    //  - doc 5 is too short for any window (2 tokens)
    val docs = Seq(
      (1L, "a b c d e u1 u2"),
      (2L, "v1 a b c d e v2"),
      (3L, "x y z p q x y z"),
      (4L, "m n o p2 q2 r s"),
      (5L, "t u")).toDF("id", "text")
    val out = Dedup.substringDupStats(docs, col("id"), col("text"), n = 3)
      .orderBy("id").collect()
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_windows") == 5)
    assert(byId(1L).getAs[Long]("n_dup_windows") == 3)
    assert(byId(1L).getAs[Long]("covered_toks") == 5)
    assert(byId(2L).getAs[Long]("covered_toks") == 5)
    assert(byId(3L).getAs[Long]("n_dup_windows") == 2)
    assert(byId(3L).getAs[Long]("covered_toks") == 6)
    assert(byId(3L).getAs[Double]("dup_frac_r") == 0.75)
    assert(byId(4L).getAs[Long]("n_dup_windows") == 0)
    assert(byId(4L).getAs[Long]("covered_toks") == 0)
    assert(byId(5L).getAs[Long]("n_windows") == 0)
    // overlapping intra-doc windows merge: "w w w w" has windows at 1,2
    // both duplicated (same text) → union [1,3] ∪ [2,4] = 4 tokens
    val rep = Seq((9L, "w w w w")).toDF("id", "text")
    val r9 = Dedup.substringDupStats(rep, col("id"), col("text"), n = 3)
      .collect().head
    assert(r9.getAs[Long]("n_dup_windows") == 2)
    assert(r9.getAs[Long]("covered_toks") == 4)
    assert(r9.getAs[Double]("dup_frac_r") == 1.0)
  }

  test("substringDupStats on sf0.01: planted near-dup docs carry duplicated spans") {
    val out = Dedup.substringDupStats(docs, col("doc_id"), col("text"), n = 15)
    assert(out.count() == docs.count())
    val hit = out.filter(col("n_dup_windows") > 0)
      .select("id").as[Long].collect().toSet
    assert(hit.nonEmpty)
    // planted near-dup pair members overwhelmingly share ≥15-token runs
    // with their twin (not all: a short doc with dense scattered edits can
    // be 0.98-jaccard-similar without any 15-token verbatim run)
    val planted = exactPairs.flatMap(p => Seq(p._1, p._2))
    assert(planted.intersect(hit).size >= (planted.size * 8) / 10)
    // layout independence
    val out7 = Dedup.substringDupStats(
      docs.repartition(7), col("doc_id"), col("text"), n = 15)
    assert(out7.orderBy("id").collect().toSeq == out.orderBy("id").collect().toSeq)
  }

  test("boilerplate: per-stratum banner cut, content kept in order, small strata immune") {
    import spark.implicits._
    // stratum A: 3 docs sharing a banner (df 3/3 > 0.5, ≥ minDocs 2);
    // stratum B: 2 docs sharing a line but minDocs 3 protects it
    val docs = Seq(
      (1L, "A", "BANNER\nalpha\nbeta"),
      (2L, "A", "gamma\nBANNER\ndelta"),
      (3L, "A", "BANNER"),
      (4L, "B", "SHARED\none"),
      (5L, "B", "two\nSHARED"))
      .toDF("id", "src", "text")
    val out = Dedup.boilerplate(docs, col("id"), col("text"), col("src"),
        minDocs = 3L, frac = 0.5)
      .orderBy("id")
      .select("id", "n_lines", "n_kept", "kept_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 2L, "alpha\nbeta"),
      (2L, 3L, 2L, "gamma\ndelta"),
      (3L, 1L, 0L, null),
      (4L, 2L, 2L, "SHARED\none"),
      (5L, 2L, 2L, "two\nSHARED")))
  }

  test("boilerplate: repeated line within ONE doc is not boilerplate; guards") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A", "echo\necho\necho"), (2L, "A", "x"), (3L, "A", "y"),
      (4L, "A", "z"), (5L, "A", "w"), (6L, "A", "v"))
      .toDF("id", "src", "text")
    // 'echo' present in 1 of 6 docs (presence, not occurrences): an
    // occurrence count of 3 would cross frac·docs = 1.8, presence stays
    // below it -> kept
    val out = Dedup.boilerplate(docs, col("id"), col("text"), col("src"),
        minDocs = 1L, frac = 0.3)
      .filter(col("id") === 1L).select("n_kept").as[Long].head()
    assert(out === 3L)
    intercept[IllegalArgumentException](
      Dedup.boilerplate(docs, col("id"), col("text"), col("src"), minDocs = 0L))
    intercept[IllegalArgumentException](
      Dedup.boilerplate(docs, col("id"), col("text"), col("src"), frac = 1.5))
  }

  test("winnow containment: an excerpt scores high toward its superset, not back") {
    import graft.operators.TextAnalysis
    val small = "the quick brown fox jumps over the lazy dog near the river bank today"
    val big = small + " and then a very long continuation about entirely different " +
      "matters with many additional unique tokens stretching the document much " +
      "further than the excerpt ever went covering weather markets history science " +
      "art travel cooking music sports politics and several other topics entirely"
    val docs = Seq((1L, small), (2L, big), (3L, "nothing in common here at all with anyone"))
      .toDF("doc_id", "text")
    val sketch = TextAnalysis.winnow(docs, col("doc_id"), col("text"), n = 3, window = 4)
    val out = TextAnalysis.winnowContainment(sketch, minShared = 1, minContainment = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // the excerpt is (nearly) fully contained in the superset...
    assert(out((1L, 2L)) >= 0.9, out)
    // ...but the superset is NOT contained in the excerpt (asymmetry)
    assert(out((2L, 1L)) < 0.5, out)
    assert(!out.keySet.exists(k => k._1 == 3L || k._2 == 3L), out)
    // guards
    intercept[IllegalArgumentException](TextAnalysis.winnowContainment(sketch, 0, 0.5))
    intercept[IllegalArgumentException](TextAnalysis.winnowContainment(sketch, 1, 1.5))
  }
}
