package graft

import org.apache.spark.sql.functions._
import graft.operators.{AudioPrint, Multimodal, Phash}

/** Laws for the spectral audio fingerprint: gain invariance (the
  * contour encodes energy RATIOS), discrimination of different tone
  * stacks, multi-index pairing equals brute force, and undecodable
  * shedding.
  */
class AudioPrintSpec extends SparkSuite {
  import spark.implicits._

  /** Two-tone synthetic WAV: frequencies seeded by `seed`, 16-bit mono. */
  private def wav(seed: Int, amp: Int, extraTone: Boolean = false): Array[Byte] = {
    val rate = 8000f
    val n = 4000
    val f1 = 300.0 + (seed * 137) % 1500
    val f2 = 600.0 + (seed * 211) % 2500
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      var v = math.sin(2 * math.Pi * f1 * i / rate) * amp +
        math.sin(2 * math.Pi * f2 * i / rate) * (amp / 2)
      if (extraTone) v += math.sin(2 * math.Pi * 1234.0 * i / rate) * (amp / 16)
      val s = v.toInt.toShort
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

  private def printOf(bytes: Array[Byte]): Long =
    AudioPrint.fingerprintBytes(bytes).get

  test("gain change barely moves the print; different tones diverge") {
    val full = printOf(wav(3, 8000))
    val quiet = printOf(wav(3, 2000))
    val other = printOf(wav(9, 8000))
    assert(java.lang.Long.bitCount(full ^ quiet) <= 3,
      s"gain flipped ${java.lang.Long.bitCount(full ^ quiet)} bits")
    assert(java.lang.Long.bitCount(full ^ other) >= 5,
      s"different tones only ${java.lang.Long.bitCount(full ^ other)} apart")
  }

  test("a faint extra tone moves few bits") {
    val base = printOf(wav(5, 8000))
    val extra = printOf(wav(5, 8000, extraTone = true))
    assert(java.lang.Long.bitCount(base ^ extra) <= 6,
      s"faint tone flipped ${java.lang.Long.bitCount(base ^ extra)} bits")
  }

  test("pairing via the shared banding equals brute force; shed undecodable") {
    val clips = (0 until 9).map { i =>
      // 3 groups of 3: base, re-gained, faint-extra
      val seed = i / 3 * 7 + 1
      val bytes = (i % 3) match {
        case 0 => wav(seed, 8000)
        case 1 => wav(seed, 3000)
        case _ => wav(seed, 8000, extraTone = true)
      }
      (i.toLong, bytes)
    } :+ ((99L, Array[Byte](9, 9, 9)))
    val df = Multimodal.withPayload(
      clips.toDF("doc_id", "bytes"), col("doc_id"), col("bytes"), "audio/wav")
    val prints = AudioPrint.fingerprint(df)
    assert(prints.count() === 9)
    val hs = prints.as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d)).toSet
    val got = Phash.phashPairs(prints, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture must contain near-dup clips")
  }
}
