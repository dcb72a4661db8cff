package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Distances

/** Deduplication operators for large-scale text/embedding corpora: exact
  * (hash-group), n-gram Jaccard (inverted-index join — no cross product),
  * MinHash signatures + LSH banding, SimHash, and embedding-cosine
  * near-dup pairs.
  *
  * Hashing is md5-based (first 15 hex chars → 60-bit non-negative long) so
  * every stage is reproducible in any engine with md5 — the correctness
  * oracles replay these pipelines verbatim in SQL.
  *
  * Scale notes (100 TB): every pairing step is an equi-join on a derived
  * key (shingle, band hash, block id) — Spark shuffles on that key and
  * never materializes the O(n²) pair space. The one skew hazard is a
  * shingle shared by a large fraction of documents; `maxShingleDf` drops
  * such stop-shingles (trading exactness, off by default so oracles stay
  * closed-form).
  */
object Dedup {

  val TokenPattern = "[^\\p{L}\\p{N}]+"

  /** Raw lowercase tokens (stopwords kept — dedup wants verbatim shape). */
  def tokens(text: Column): Column =
    filter(split(lower(text), TokenPattern), t => t =!= "")

  /** Distinct word n-gram shingles of the text. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** 60-bit non-negative hash of a string column (md5 prefix). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact-duplicate summary: total rows, distinct texts, duplicate groups. */
  def exactStats(df: DataFrame, text: Column): DataFrame =
    df.select(md5(text).as("_k"))
      .groupBy("_k").agg(count(lit(1)).as("_n"))
      .agg(
        sum(col("_n")).as("n_total"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("_n") > 1, 1L).otherwise(0L)).as("n_dup_groups"))

  /** Exact n-gram Jaccard similar pairs via inverted-index join:
    * explode shingles → self-join on the shingle → per-pair common count →
    * jaccard = common / (|A| + |B| − common) ≥ threshold.
    */
  def ngramJaccardPairs(
      df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.5,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val base = df.select(id.as("_pid"), shingles(text, n).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_cnt", size(col("_sh")))
    val posts0 = base.select(col("_pid"), col("_cnt"), explode(col("_sh")).as("_s"))
    val posts = maxShingleDf match {
      case None => posts0
      case Some(cap) =>
        // drop stop-shingles to bound join fan-out (skew guard)
        val rare = posts0.groupBy("_s").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= cap).select("_s")
        posts0.join(broadcast(rare), "_s")
    }
    val a = posts.select(col("_pid").as("id_a"), col("_cnt").as("ca"), col("_s"))
    val b = posts.select(col("_pid").as("id_b"), col("_cnt").as("cb"), col("_s"))
    a.join(b, Seq("_s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "ca", "cb")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("ca") + col("cb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures, one row per (id, perm): minhash_p =
    * min over shingles of hash60(shingle + "#" + p).
    */
  def minhashSignatures(
      df: DataFrame, id: Column, text: Column,
      n: Int = 3, perms: Int = 16): DataFrame =
    df.select(id.as("_pid"), shingles(text, n).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(col("_pid"), explode(col("_sh")).as("_s"))
      .select(col("_pid"), col("_s"), explode(sequence(lit(0), lit(perms - 1))).as("perm"))
      .groupBy("_pid", "perm")
      .agg(min(hash60(concat(col("_s"), lit("#"), col("perm").cast("string")))).as("minhash"))
      .select(col("_pid").as("id"), col("perm"), col("minhash"))

  /** LSH candidate pairs from banded signatures, verified by signature
    * agreement: band hash = md5 of the band's minhashes; pairs sharing any
    * band are estimated as (equal perms)/perms and kept at ≥ threshold.
    */
  def minhashLshPairs(
      sigs: DataFrame, perms: Int = 16, bandRows: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val banded = sigs
      .withColumn("band", (col("perm") / bandRows).cast("int"))
      .groupBy("id", "band")
      .agg(sort_array(collect_list(struct(col("perm"), col("minhash")))).as("_bs"))
      .withColumn("bandkey",
        md5(concat_ws(",", transform(col("_bs"), s => s.getField("minhash").cast("string")))))
      .select("id", "band", "bandkey")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandkey") === col("b.bandkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sa = sigs.select(col("id").as("id_a"), col("perm"), col("minhash").as("ha"))
    val sb = sigs.select(col("id").as("id_b"), col("perm"), col("minhash").as("hb"))
    cand.join(sa, "id_a").join(sb, Seq("id_b", "perm"))
      .groupBy("id_a", "id_b")
      .agg((sum(when(col("ha") === col("hb"), 1).otherwise(0)) / lit(perms))
        .cast("double").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 60-bit SimHash per document: bit j of the fingerprint is set when
    * Σ_terms freq · (±1 by bit j of hash60(term)) > 0.
    */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val posts = df.select(id.as("_pid"), explode(tokens(text)).as("_t"))
      .groupBy("_pid", "_t").agg(count(lit(1)).as("_freq"))
      .withColumn("_h", hash60(col("_t")))
    posts
      .select(col("_pid"), col("_freq"), col("_h"),
        explode(sequence(lit(0), lit(59))).as("j"))
      .withColumn("_sign",
        when(expr("((_h >> j) & 1) = 1"), col("_freq")).otherwise(-col("_freq")))
      .groupBy("_pid", "j")
      .agg(sum(col("_sign")).as("_s"))
      .groupBy("_pid")
      .agg(sum(when(col("_s") > 0,
        expr("CAST(power(2, j) AS BIGINT)")).otherwise(0L)).as("simhash"))
      .select(col("_pid").as("id"), col("simhash"))
  }

  /** Embedding near-duplicate pairs: true-cosine similarity ≥ threshold,
    * restricted to a blocking column (label, IVF bucket, LSH band — at
    * scale the block IS the shuffle key; never an unblocked cross join).
    */
  def embeddingCosinePairs(
      df: DataFrame, id: Column, vec: Column, block: Column,
      threshold: Double): DataFrame = {
    val base = df.select(id.as("_pid"), vec.as("_v"), block.as("_blk"))
    val a = base.select(col("_pid").as("id_a"), col("_v").as("va"), col("_blk"))
    val b = base.select(col("_pid").as("id_b"), col("_v").as("vb"), col("_blk"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine_sim",
        Distances.cosineSimilarityNormalized(col("va"), col("vb")))
      .filter(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("_blk").as("block"), col("cosine_sim"))
  }
}
