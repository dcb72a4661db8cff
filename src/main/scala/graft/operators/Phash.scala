package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perceptual image hashing (the classic pHash construction) + exact
  * hamming near-dup pairing — IMAGE dedup over the REAL decode path:
  * resize the decoded raster to 32×32 by integer area-averaged Rec. 601
  * luminance, 2-D DCT-II, keep the 8×8 low-frequency block, threshold
  * each coefficient at the block's median → a 64-bit signature that
  * survives re-encoding, resizing, and small edits (what md5-exact dedup
  * is blind to, and what embedding-cosine needs a model for).
  *
  * Pairing is MULTI-INDEX HASHING (Norouzi, Punjani & Fleet 2012): the
  * 64 bits split into 4 disjoint 16-bit bands; by pigeonhole, any pair
  * within hamming ≤ 3 agrees on at least one whole band, so candidates
  * come from an EQUI-join on (band index, band value) — never an
  * all-pairs product — and the exact popcount verifies. Same skeleton as
  * the MinHash-LSH and SimHash pipelines; PlanLint covers the plan.
  *
  * Determinism: our decoders are lossless (PNG/BMP/GIF), the resize is
  * integer sums, and the DCT is fixed-order double loops — the hash is a
  * pure function of the payload bytes, so gate results pin as goldens
  * (DuckDB cannot decode images; the vamana_graph convention).
  */
object Phash {

  private val N = 32 // resize target; DCT size
  private val K = 8  // low-frequency block

  /** 64-bit pHash of one image payload; None when no JDK reader accepts
    * the bytes (the decode()-family shedding contract).
    */
  private[graft] def phashBytes(payload: Array[Byte]): Option[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }
    img.filter(i => i.getWidth > 0 && i.getHeight > 0).map { im =>
      val w = im.getWidth; val h = im.getHeight
      // integer area-average luminance into N×N cells
      val sums = Array.ofDim[Long](N, N)
      val counts = Array.ofDim[Long](N, N)
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        im.getRGB(0, y, w, 1, rowBuf, 0, w)
        val cy = y * N / h
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          val cx = x * N / w
          sums(cy)(cx) += lum
          counts(cy)(cx) += 1L
          x += 1
        }
        y += 1
      }
      val cell = Array.ofDim[Double](N, N)
      var i = 0
      while (i < N) {
        var j = 0
        while (j < N) {
          cell(i)(j) = if (counts(i)(j) == 0) 0.0 else sums(i)(j).toDouble / counts(i)(j)
          j += 1
        }
        i += 1
      }
      // separable 2-D DCT-II of the K×K low-frequency corner
      val cos = Array.tabulate(K, N)((u, x) =>
        math.cos((2 * x + 1) * u * math.Pi / (2.0 * N)))
      val coeffs = new Array[Double](K * K)
      var u = 0
      while (u < K) {
        var v = 0
        while (v < K) {
          var acc = 0.0
          var x = 0
          while (x < N) {
            var yy = 0
            while (yy < N) {
              acc += cell(x)(yy) * cos(u)(x) * cos(v)(yy)
              yy += 1
            }
            x += 1
          }
          coeffs(u * K + v) = acc
          v += 1
        }
        u += 1
      }
      // threshold at the median of the 64 coefficients (DC included in
      // the median but its bit, like every bit, is just > comparison —
      // the standard pHash recipe); fixed sort = deterministic
      val sorted = coeffs.clone().sorted
      val median = sorted(K * K / 2 - 1)
      var hash = 0L
      var b = 0
      while (b < K * K) {
        if (coeffs(b) > median) hash |= (1L << b)
        b += 1
      }
      hash
    }
  }

  private val HashSchema = StructType(Seq(
    StructField("id", LongType), StructField("phash", LongType)))

  /** (id, phash) for every decodable image payload of a [[Multimodal]]
    * payload frame; undecodable rows are shed like decode().
    */
  def phash(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = payloads.select(col("id").cast("long"), col("payload"))
      .rdd.mapPartitions(_.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else phashBytes(r.getAs[Array[Byte]](1)).map(h => Row(r.getLong(0), h))
      })
    spark.createDataFrame(rdd, HashSchema)
  }

  /** Near-dup pairs with hamming(a, b) ≤ `maxHamming` via multi-index
    * banding. The pigeonhole guarantee needs bands > maxHamming — with
    * the 4 fixed 16-bit bands that bounds maxHamming ≤ 3.
    */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 3,
      maxBandDf: Option[Long] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0,3] (got $maxHamming) — 4 bands only " +
        "guarantee recall up to hamming 3 (pigeonhole)")
    maxBandDf.foreach(m => require(m >= 2, s"maxBandDf must be >= 2 (got $m)"))
    val banded0 = hashes.select(col("id"), col("phash"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("phash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "bv")))
    // skew guard (the maxShingleDf convention): a band value shared by f
    // hashes contributes f² candidate rows — one viral image duplicated
    // a million times would quadratically explode the join. Dropping a
    // hot (band, value) cell weakens the pigeonhole guarantee ONLY for
    // pairs whose sole agreeing band was the dropped one; exact copies
    // (all 4 bands equal) still meet in any surviving band.
    val banded = maxBandDf match {
      case None => banded0
      case Some(m) =>
        val hot = banded0.groupBy("band", "bv").agg(count(lit(1)).as("_f"))
          .filter(col("_f") > m).select("band", "bv")
        banded0.join(hot, Seq("band", "bv"), "left_anti")
    }
    val cands = banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.phash").as("ha"), col("b.phash").as("hb"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** VIDEO near-dup pairing by shared decoded frames: two videos that
    * share ≥ `minShared` distinct frame fingerprints (the
    * [[Multimodal.frameExtract]] luminance digests) are containment
    * near-dups — trimmed, re-muxed, or concatenated copies keep frames
    * byte-identical after a lossless decode even when the container
    * bytes differ entirely. Same equi-join-on-fingerprint shape as the
    * winnowing text sketch; `maxFrameDf` drops viral frames (a black
    * frame shared by a million clips is f² candidate rows, and carries
    * no identity).
    */
  def frameSharePairs(frames: DataFrame, minShared: Int,
      maxFrameDf: Option[Long] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1 (got $minShared)")
    maxFrameDf.foreach(m => require(m >= 2, s"maxFrameDf must be >= 2 (got $m)"))
    val d0 = frames.select(col("id"), col("frame_sha")).distinct()
    val d = maxFrameDf match {
      case None => d0
      case Some(m) =>
        val hot = d0.groupBy("frame_sha").agg(count(lit(1)).as("_f"))
          .filter(col("_f") > m).select("frame_sha")
        d0.join(hot, Seq("frame_sha"), "left_anti")
    }
    d.alias("a").join(d.alias("b"),
        col("a.frame_sha") === col("b.frame_sha") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
