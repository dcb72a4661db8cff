package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

/** Hand-computed windows, the coverage/overlap laws, edge docs, input
  * guards, and layout independence for the RAG chunker.
  */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e f g h i j"), // 10 tokens
    (2L, "x y z"),               // n < size -> single chunk
    (3L, ""),                    // zero tokens -> no chunks
    (4L, null.asInstanceOf[String]))
    .toDF("doc_id", "text")

  test("hand fixture: size=4 stride=3 over 10 tokens -> 3 chunks") {
    val out = Chunking.chunk(docs, col("doc_id"), col("text"), 4, 3)
      .filter($"id" === 1L).orderBy("chunk_id")
      .select("chunk_id", "tok_start", "n_tokens", "chunk_text")
      .as[(Int, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (0, 0L, 4L, "a b c d"),
      (1, 3L, 4L, "d e f g"),
      (2, 6L, 4L, "g h i j")))
  }

  test("short doc emits exactly one whole-doc chunk; empty/null emit none") {
    val out = Chunking.chunk(docs, col("doc_id"), col("text"), 4, 3)
    val short = out.filter($"id" === 2L)
      .select("chunk_id", "tok_start", "n_tokens", "chunk_text")
      .as[(Int, Long, Long, String)].collect().toSeq
    assert(short === Seq((0, 0L, 3L, "x y z")))
    assert(out.filter($"id" > 2L).count() === 0)
  }

  test("coverage law: every token position is inside some chunk; overlap = size - stride") {
    val text = (1 to 137).map(i => s"t$i").mkString(" ")
    val one = Seq((9L, text)).toDF("doc_id", "text")
    val out = Chunking.chunk(one, col("doc_id"), col("text"), 16, 11)
      .orderBy("chunk_id")
      .select("tok_start", "n_tokens").as[(Long, Long)].collect().toSeq
    // intervals must tile [0, 137) with no gap and the last must end at 137
    assert(out.head._1 === 0L)
    assert(out.last._1 + out.last._2 === 137L)
    out.sliding(2).foreach {
      case Seq((s0, n0), (s1, _)) =>
        assert(s1 === s0 + 11, "starts advance by stride")
        assert(s1 < s0 + n0, "consecutive chunks overlap")
      case _ =>
    }
    // no chunk is fully contained in the previous (no redundant tail)
    assert(out.map(_._1).distinct.size === out.size)
  }

  test("exact boundary: n a multiple of stride reaching size exactly") {
    // n = 20, size = 8, stride = 6 -> nc = ceil(12/6)+1 = 3; last covers [12,20)
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunk(Seq((5L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 8, 6)
      .select("chunk_id", "tok_start", "n_tokens").as[(Int, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(out === Seq((0, 0L, 8L), (1, 6L, 8L), (2, 12L, 8L)))
  }

  test("guards: non-positive size, stride out of (0, size]") {
    intercept[IllegalArgumentException](
      Chunking.chunk(docs, col("doc_id"), col("text"), 0, 1))
    intercept[IllegalArgumentException](
      Chunking.chunk(docs, col("doc_id"), col("text"), 4, 0))
    intercept[IllegalArgumentException](
      Chunking.chunk(docs, col("doc_id"), col("text"), 4, 5))
  }

  test("randomized: matches a scalar reference chunker across (size, stride)") {
    def refChunks(toks: Seq[String], size: Int, stride: Int): Seq[(Int, Long, Long, String)] = {
      if (toks.isEmpty) Nil
      else {
        val n = toks.length
        val nc = if (n <= size) 1 else (n - size + stride - 1) / stride + 1
        (0 until nc).map { ci =>
          val start = ci * stride
          val slice = toks.slice(start, start + size)
          (ci, start.toLong, slice.length.toLong, slice.mkString(" "))
        }
      }
    }
    val rnd = new scala.util.Random(11)
    val docs = (1L to 60L).map { i =>
      (i, (0 until rnd.nextInt(200)).map(j => s"w${rnd.nextInt(50)}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((size, stride) <- Seq((1, 1), (5, 2), (16, 16), (64, 48), (200, 1))) {
      val got = Chunking.chunk(df, col("doc_id"), col("text"), size, stride)
        .as[(Long, Int, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5)).toSeq.sortBy(_._1))
      val want = docs.map { case (id, text) =>
        id -> refChunks(text.split(" ").filter(_.nonEmpty).toSeq, size, stride)
      }.filter(_._2.nonEmpty).toMap
      assert(got.toMap.view.mapValues(_.toList).toMap ===
        want.view.mapValues(_.toList).toMap, s"size=$size stride=$stride")
    }
  }

  test("sentence chunking: greedy budget packing, whole sentences only") {
    // sentences: 2, 3, 4, 2 tokens; budget 5 -> [s1 s2] [s3] [s4]... greedy:
    // s1(2) fits; s2(3) -> 5 fits; s3(4) -> would be 9 > 5: new chunk; s4(2)
    // -> 6 > 5: new chunk
    val d = Seq((1L, "One two. Three four five! Six seven eight nine? Ten eleven"))
      .toDF("doc_id", "text")
    val out = Chunking.chunkBySentences(d, col("doc_id"), col("text"), maxTokens = 5)
      .orderBy("chunk_id")
      .select("chunk_id", "n_sentences", "n_tokens", "chunk_text")
      .as[(Int, Int, Int, String)].collect().toSeq
    assert(out === Seq(
      (0, 2, 5, "One two. Three four five!"),
      (1, 1, 4, "Six seven eight nine?"),
      (2, 1, 2, "Ten eleven")))
  }

  test("sentence chunking: oversized sentence gets its own chunk; empty docs drop") {
    val d = Seq(
      (1L, "a b c d e f g h. tiny."),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Chunking.chunkBySentences(d, col("doc_id"), col("text"), maxTokens = 3)
    val rows = out.orderBy("id", "chunk_id")
      .select("id", "chunk_id", "n_tokens").as[(Long, Int, Int)].collect().toSeq
    assert(rows === Seq((1L, 0, 8), (1L, 1, 1)))
  }

  test("sentence chunking: every token lands in exactly one chunk, order kept") {
    val docs = Tables.documents(spark, sf0001)
    val chunks = Chunking.chunkBySentences(docs, col("doc_id"), col("text"), 50)
    // per doc: sum of chunk token counts == doc token count over sentences
    val perDoc = chunks.groupBy("id").agg(sum("n_tokens").as("nt"))
    val direct = docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("id"),
        org.apache.spark.sql.functions.size(
          graft.operators.Dedup.tokens(col("text"))).as("nd"))
      .filter(col("nd") > 0)
    val joined = perDoc.join(direct, Seq("id"))
    assert(joined.count() > 0)
    // sentence segmentation preserves tokens: punctuation is split away by
    // the tokenizer in both views
    assert(joined.filter(col("nt") =!= col("nd")).count() === 0)
    // budget respected except single-oversized-sentence chunks
    assert(chunks.filter(col("n_tokens") > 50 && col("n_sentences") > 1).count() === 0)
  }

  test("layout independence: chunk set identical under repartition") {
    val d = Tables.documents(spark, sf0001)
    val a = Chunking.chunk(d, col("doc_id"), col("text"), 32, 24)
    val b = Chunking.chunk(d.repartition(7, col("lang")), col("doc_id"), col("text"), 32, 24)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    assert(a.count() > 0)
  }
}
