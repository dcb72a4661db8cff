package graft

import org.apache.spark.sql.functions._
import graft.model.IndexKind.Metric
import graft.operators.{Multimodal, Similarity}

/** Real image decode through `javax.imageio` (JDK-native — the PNG bytes
  * here are ENCODED and DECODED by the same registry a production JVM
  * ships): payload → decode → luminance-histogram feature → kNN join,
  * the full multimodal path with no stub in it.
  */
class ImageDecodeSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic two-tone PNG — delegates to the ONE synthesizer the
    * analytic gate oracle also assumes (multimodal_decode_png), so the
    * spec's expectations and the gate can never drift apart on pixel
    * layout.
    */
  private def png(w: Int, h: Int, split: Int, loGray: Int, hiGray: Int): Array[Byte] =
    Multimodal.synthPng(w, h, split, loGray, hiGray)

  test("PNG bytes decode via ImageIO: raster size, bands, luminance histogram") {
    val rows = Seq(
      (1L, png(8, 6, 0, 0, 10)),    // all gray 10  → luminance bin 0
      (2L, png(5, 5, 0, 0, 100)),   // all gray 100 → bin 3
      (3L, png(3, 7, 0, 0, 250)),   // all gray 250 → bin 7
      (4L, png(4, 4, 8, 10, 250)))  // half bin 0, half bin 7
    val payloads = Multimodal.withPayload(
      rows.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "image/png")
    val decoded = Multimodal.decode(payloads).collect().sortBy(_.getLong(0))
    assert(decoded.length == 4)
    val r1 = decoded(0)
    assert(r1.getInt(1) == 8 && r1.getInt(2) == 6, "decoded raster size")
    assert(r1.getInt(3) == 3, "RGB PNG raster has 3 bands")
    val f1 = r1.getSeq[Float](0 + 4)
    assert(f1.length == 8 && f1(0) == 1f, s"uniform gray 10 is all bin 0: $f1")
    assert(decoded(1).getSeq[Float](4)(3) == 1f)
    assert(decoded(2).getSeq[Float](4)(7) == 1f)
    val f4 = decoded(3).getSeq[Float](4)
    assert(f4(0) == 0.5f && f4(7) == 0.5f, s"half/half split: $f4")
    assert(decoded.forall(r => math.abs(r.getSeq[Float](4).sum - 1f) < 1e-5))
  }

  /** Deterministic WAV: `n` mono 16-bit little-endian PCM frames at
    * `rate` Hz, sample i = amp·sin(2π·440·i/rate).
    */
  private def wav(n: Int, rate: Float, amp: Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp).toInt.toShort
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WAV bytes decode via javax.sound.sampled: rate, frames, amplitude histogram") {
    val rows = Seq(
      (1L, wav(8000, 8000f, 16000)), // 1 s @ 8 kHz; |amp| ≤ 16000 → bins 0..3
      (2L, wav(400, 16000f, 0)))     // silence → all mass in bin 0
    val payloads = Multimodal.withPayload(
      rows.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "audio/wav")
    val decoded = Multimodal.decode(payloads).collect().sortBy(_.getLong(0))
    assert(decoded.length == 2)
    val r1 = decoded(0)
    assert(r1.getInt(1) == 8000, "width = sample rate")
    assert(r1.getInt(2) == 8000, "height = frame count")
    assert(r1.getInt(3) == 1, "mono")
    val f1 = r1.getSeq[Float](4)
    assert(f1.length == 8 && math.abs(f1.sum - 1f) < 1e-5)
    assert(f1.drop(4).forall(_ == 0f), s"16000-amp sine stays in bins 0..3: $f1")
    assert(f1(3) > 0f, s"sine peaks reach bin 3: $f1")
    val f2 = decoded(1).getSeq[Float](4)
    assert(f2(0) == 1f, s"silence is all bin 0: $f2")
  }

  test("non-PCM / corrupt audio payloads are shed like corrupt images") {
    val mixed = Seq(
      (1L, wav(100, 8000f, 1000)),
      (2L, "definitely not a WAV".getBytes("UTF-8")))
    val asAudio = Multimodal.withPayload(
      mixed.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "audio/wav")
    assert(Multimodal.decode(asAudio).select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("corrupt image payloads are shed, not failed; non-image mimes keep the stub") {
    val mixed = Seq(
      (1L, png(4, 4, 0, 0, 50)),
      (2L, "definitely not a PNG".getBytes("UTF-8")))
    val asImages = Multimodal.withPayload(
      mixed.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "image/png")
    assert(Multimodal.decode(asImages).select("id").as[Long].collect().toSeq == Seq(1L))
    // the same corrupt bytes under a text mime run the deterministic stub
    val asText = Multimodal.withPayload(
      mixed.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "text/plain")
    assert(Multimodal.decode(asText).count() == 2)
  }

  test("animated GIF frames extract DECODED via ImageIO: count, dims, distinct digests") {
    val rows = Seq(
      (1L, Multimodal.synthGif(nFrames = 5, w = 16, h = 12, phase = 17)),
      (2L, Multimodal.synthGif(nFrames = 1, w = 8, h = 8, phase = 0)))
    val payloads = Multimodal.withPayload(
      rows.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "video/gif")
    val frames = Multimodal.frameExtract(payloads, stride = 1).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => (k, v.sortBy(_.getInt(1))) }
    assert(frames(1L).length == 5, "every frame of the 5-frame gif extracts")
    assert(frames(2L).length == 1)
    assert(frames(1L).forall(r => r.getInt(2) == 16 && r.getInt(3) == 12), "raster dims")
    assert(frames(1L).map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4), "contiguous frame_idx")
    // phase 17 moves the gradient each frame → every frame's pixel content differs
    assert(frames(1L).map(_.getString(4)).distinct.length == 5, "per-frame digests differ")
    // phase 0: a single frame hashes deterministically across calls
    val again = Multimodal.frameExtract(payloads, stride = 1).collect()
      .filter(_.getLong(0) == 2L).head.getString(4)
    assert(again == frames(2L).head.getString(4), "digest is deterministic")
  }

  test("frameExtract stride samples every stride-th decoded frame") {
    val payloads = Multimodal.withPayload(
      Seq((7L, Multimodal.synthGif(nFrames = 6, w = 10, h = 10, phase = 31)))
        .toDF("doc_id", "bytes"),
      col("doc_id"), col("bytes"), "video/gif")
    val all = Multimodal.frameExtract(payloads, stride = 1).collect().sortBy(_.getInt(1))
    val sampled = Multimodal.frameExtract(payloads, stride = 2).collect().sortBy(_.getInt(1))
    assert(sampled.length == 3, "6 frames at stride 2 → frames 0,2,4")
    // sampled frame k is source frame 2k — digests must line up exactly
    assert(sampled.map(_.getString(4)).toSeq ==
      Seq(all(0), all(2), all(4)).map(_.getString(4)))
  }

  test("corrupt video payloads shed; video mime through decode() aggregates all frames") {
    val rows = Seq(
      (1L, Multimodal.synthGif(nFrames = 4, w = 6, h = 6, phase = 13)),
      (2L, "definitely not a GIF".getBytes("UTF-8")))
    val payloads = Multimodal.withPayload(
      rows.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "video/gif")
    assert(Multimodal.frameExtract(payloads, 1).select("id").distinct()
      .as[Long].collect().toSeq == Seq(1L))
    val decoded = Multimodal.decode(payloads).collect()
    assert(decoded.length == 1, "corrupt video sheds through decode too")
    val r = decoded.head
    assert(r.getInt(1) == 6 && r.getInt(2) == 6, "dims from frame 0")
    assert(r.getInt(3) == 4, "channels = frame count for video")
    val f = r.getSeq[Float](4)
    assert(f.length == 8 && math.abs(f.sum - 1f) < 1e-5, s"histogram normalizes: $f")
  }

  test("resizeImage: box-filter downscale caps dims, preserves aspect and uniform color") {
    val rows = Seq(
      (1L, png(80, 60, 0, 0, 100)),   // 80×60 uniform gray 100 → 32×24
      (2L, png(10, 10, 0, 0, 200)))   // already inside the cap → byte-identical
    val payloads = Multimodal.withPayload(
      rows.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "image/png")
    val resized = Multimodal.resizeImage(payloads, maxDim = 32).collect()
      .map(r => r.getLong(0) -> r).toMap
    val decoded = Multimodal.decode(
      Multimodal.resizeImage(payloads, maxDim = 32)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(decoded(1L).getInt(1) == 32 && decoded(1L).getInt(2) == 24,
      "80×60 at cap 32 → 32×24 (aspect preserved)")
    // box average of a uniform raster is exactly the same gray → bin 3 only
    val f1 = decoded(1L).getSeq[Float](4)
    assert(f1(3) == 1f, s"uniform gray 100 survives resize exactly: $f1")
    assert(java.util.Arrays.equals(
      resized(2L).getAs[Array[Byte]](1), rows(1)._2),
      "image already inside the cap passes through byte-identical")
    // meta struct refreshed from the ACTUAL output bytes
    resized.values.foreach { r =>
      val bytes = r.getAs[Array[Byte]](1)
      val meta = r.getStruct(2)
      assert(meta.getString(0) == "image/png",
        "both branches report the real container (PNG in, PNG out)")
      assert(meta.getLong(1) == bytes.length.toLong, "meta.n_bytes matches payload")
      val md = java.security.MessageDigest.getInstance("MD5")
      assert(meta.getString(2) == md.digest(bytes).map(b => f"$b%02x").mkString,
        "meta.sha matches payload")
    }
    // corrupt bytes shed, not failed
    val corrupt = Multimodal.withPayload(
      Seq((9L, "not a PNG".getBytes("UTF-8"))).toDF("doc_id", "bytes"),
      col("doc_id"), col("bytes"), "image/png")
    assert(Multimodal.resizeImage(corrupt, 32).count() == 0)
  }

  test("resizeImage halving a two-tone split keeps the tone boundary proportions") {
    // top half gray 40, bottom half gray 240: after a 2× downscale every
    // output pixel still comes from ONE tone (box cells never straddle the
    // boundary at even dims) → histogram stays exactly 50/50
    val payloads = Multimodal.withPayload(
      Seq((1L, png(64, 64, 64 * 32, 40, 240))).toDF("doc_id", "bytes"),
      col("doc_id"), col("bytes"), "image/png")
    val f = Multimodal.decode(Multimodal.resizeImage(payloads, maxDim = 32))
      .collect().head.getSeq[Float](4)
    assert(f(1) == 0.5f && f(7) == 0.5f, s"two-tone proportions survive: $f")
  }

  test("decoded image features feed knnJoin: nearest neighbor = nearest exposure") {
    // 11 images along an exposure gradient: image i has i² of its 100
    // pixels dark (bin 1) and the rest bright (bin 6). Quadratic spacing
    // makes i's nearest non-self neighbor UNIQUE (|i²−(i+1)²| ≠ |i²−(i−1)²|)
    val grad = (0 to 10).map(i => (i.toLong, png(10, 10, i * i, 40, 200)))
    val payloads = Multimodal.withPayload(
      grad.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "image/png")
    val feats = Multimodal.decode(payloads)
      .select(col("id"), col("feature"))
    val nn = Similarity.knnJoin(
      feats, col("id"), col("feature"),
      feats, col("id"), col("feature"), k = 2, metric = Metric.Euclidean)
      .filter(col("query_id") =!= col("corpus_id")) // drop the self-match
      .select(col("query_id").as[Long], col("corpus_id").as[Long])
      .collect().toMap
    (0 to 10).foreach { i =>
      val want = if (i == 0) 1L else i - 1L // i² sits closer to (i−1)² than (i+1)²
      assert(nn(i.toLong) == want, s"image $i nearest ${nn(i.toLong)}, want $want")
    }
  }
}
