package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Phash}

/** Laws for perceptual image hashing: identity, robustness to small
  * edits, discrimination of different images, the multi-index join's
  * exactness vs brute force, undecodable shedding, and determinism.
  */
class PhashSpec extends SparkSuite {
  import spark.implicits._

  /** Textured deterministic PNG: per-pixel hash noise seeded by (a, b).
    * Texture matters — a flat gradient puts ~60 of the 64 DCT
    * coefficients at ≈0, so the median threshold flips en masse under
    * any perturbation; noisy images spread the spectrum the way real
    * photos do, which is the regime pHash is built for.
    */
  private def png(a: Int, b: Int, w: Int = 64, h: Int = 64,
      tweak: Option[(Int, Int, Int)] = None): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val mix = x * 73856093 ^ y * 19349663 ^ a * 83492791 ^ b * 2654435761L.toInt
      val g = ((mix * 2246822519L.toInt) >>> 24) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    tweak.foreach { case (tx, ty, tg) => img.setRGB(tx, ty, (tg << 16) | (tg << 8) | tg) }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hashOf(bytes: Array[Byte]): Long = Phash.phashBytes(bytes).get

  test("identical pixels hash identically; re-encode-as-BMP too") {
    val p = png(3, 5)
    assert(hashOf(p) === hashOf(png(3, 5)))
    // same pixels through a different lossless container
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    assert(hashOf(bos.toByteArray) === hashOf(p))
  }

  test("a one-pixel edit moves few bits; a different image moves many") {
    val base = hashOf(png(3, 5))
    val tweaked = hashOf(png(3, 5, tweak = Some((10, 10, 255))))
    val other = hashOf(png(9, 2))
    assert(java.lang.Long.bitCount(base ^ tweaked) <= 3,
      s"one-pixel edit flipped ${java.lang.Long.bitCount(base ^ tweaked)} bits")
    assert(java.lang.Long.bitCount(base ^ other) >= 10,
      s"different image only ${java.lang.Long.bitCount(base ^ other)} bits apart")
  }

  test("multi-index pairs equal brute force at hamming <= 3; shed undecodable") {
    val imgs = (0 until 12).map { i =>
      val bytes =
        if (i % 3 == 2) png(i + 2, 2 * i + 1, tweak = Some((5, 5, 200))) // near-dup of i-2? no: unique
        else png((i / 3) * 4 + 1, (i / 3) * 3 + 2, tweak = if (i % 3 == 1) Some((7, 7, 0)) else None)
      (i.toLong, bytes)
    } :+ ((99L, Array[Byte](1, 2, 3))) // undecodable
    val df = Multimodal.withPayload(
      imgs.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "image/png")
    val hashes = Phash.phash(df)
    assert(hashes.count() === 12) // 99 shed
    val hs = hashes.as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d)).toSet
    val got = Phash.phashPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture must contain at least one near-dup pair")
  }

  test("maxBandDf skew guard: hot band dropped, exact copies still pair") {
    // 20 exact copies of one image (all bands hot at df 20) + 2 copies of
    // another: with maxBandDf = 10 the hot cells drop, but exact copies
    // agree on EVERY band, so the small group still pairs on its own
    // (sub-threshold) cells; the viral group loses only its own pairs.
    val a = png(1, 2); val b = png(8, 9)
    val imgs = (0 until 20).map(i => (i.toLong, a)) ++ Seq((100L, b), (101L, b))
    val df = Multimodal.withPayload(
      imgs.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "image/png")
    val hashes = Phash.phash(df)
    val pairs = Phash.phashPairs(hashes, maxHamming = 0, maxBandDf = Some(10))
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((100L, 101L, 0)))
    intercept[IllegalArgumentException](
      Phash.phashPairs(hashes, maxHamming = 0, maxBandDf = Some(1)))
  }

  test("frameSharePairs: shared decoded frames pair videos; hot-frame guard") {
    // clips 0 & 1 share (w, phase) -> common frame indices are
    // pixel-identical; clip 2 differs in phase and shares nothing
    val gifs = Seq(
      (0L, Multimodal.synthGif(4, 16, 12, 17)),
      (1L, Multimodal.synthGif(6, 16, 12, 17)),
      (2L, Multimodal.synthGif(4, 16, 12, 48)))
    val df = Multimodal.withPayload(
      gifs.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "video/gif")
    val frames = Multimodal.frameExtract(df, stride = 1)
    val pairs = graft.operators.Phash.frameSharePairs(frames, minShared = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((0L, 1L, 4L)))
    // frame 0 is phase-INDEPENDENT (f·phase = 0) — a genuine viral frame
    // present in all three clips. The df cap drops it: the (0,1) pair
    // loses exactly that one shared frame, and the cross-phase pairs
    // (whose ONLY shared frame it was) stay unpaired as before.
    val guarded = graft.operators.Phash.frameSharePairs(frames, 3, maxFrameDf = Some(2))
      .as[(Long, Long, Long)].collect().toSeq
    assert(guarded === Seq((0L, 1L, 3L)))
    intercept[IllegalArgumentException](
      graft.operators.Phash.frameSharePairs(frames, minShared = 0))
  }

  test("layout independence and the maxHamming guard") {
    val imgs = (0 until 8).map(i => (i.toLong, png(i + 1, i + 2)))
    val df = Multimodal.withPayload(
      imgs.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "image/png")
    val a = Phash.phash(df).as[(Long, Long)].collect().toMap
    val b = Phash.phash(
      Multimodal.withPayload(imgs.toDF("doc_id", "bytes").repartition(5),
        col("doc_id"), col("bytes"), "image/png")).as[(Long, Long)].collect().toMap
    assert(a === b)
    intercept[IllegalArgumentException](
      Phash.phashPairs(Phash.phash(df), maxHamming = 4))
  }
}
