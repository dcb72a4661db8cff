package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spectral audio fingerprinting — the audio sibling of [[Phash]], in the
  * Haitsma–Kalker lineage: a clip's identity is the CONTOUR of its
  * spectrum (which bands carry more energy than their neighbours), not
  * its bytes, so re-encoded, re-gained, or lightly-noised copies of the
  * same recording fingerprint together while different audio diverges.
  *
  * Construction: decode PCM via the real `javax.sound.sampled` path
  * (WAV/AIFF/AU — the formats the JDK ships codecs for), mono-mix, then
  * 64 log-spaced Goertzel band energies over 200–4000 Hz;
  * bit k = E(k+1) > E(k) — 63 bits of spectral shape. Energy RATIOS are
  * what's encoded, so uniform gain cancels; fixed-order double loops
  * keep the print a pure function of the payload bytes (golden-pinnable,
  * like every decoded-media gate). Pairing reuses [[Phash.phashPairs]]'s
  * multi-index hamming banding unchanged.
  */
object AudioPrint {

  private val Bands = 64
  private val FLo = 200.0
  private val FHi = 4000.0
  private val SampleBudget = 1 << 20

  /** 63-bit spectral-contour fingerprint; None when no JDK codec accepts
    * the payload (the decode()-family shedding contract).
    */
  private[graft] def fingerprintBytes(payload: Array[Byte]): Option[Long] = {
    import javax.sound.sampled._
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
        (fmt.getSampleSizeInBits != 16 && fmt.getSampleSizeInBits != 8)) return None
      val bytesPerFrame = fmt.getFrameSize
      val raw = ais.readNBytes(SampleBudget * bytesPerFrame)
      val channels = fmt.getChannels
      val bps = fmt.getSampleSizeInBits / 8
      val n = raw.length / bytesPerFrame
      if (n < 32) return None
      // mono mix to doubles
      val mono = new Array[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val off = i * bytesPerFrame + c * bps
          val s =
            if (bps == 2) {
              val lo = raw(off) & 0xFF
              val hi = raw(off + 1)
              if (fmt.isBigEndian) ((raw(off) << 8) | (raw(off + 1) & 0xFF)).toShort.toDouble
              else ((hi << 8) | lo).toShort.toDouble
            } else raw(off).toDouble
          acc += s
          c += 1
        }
        mono(i) = acc / channels
        i += 1
      }
      val rate = fmt.getSampleRate.toDouble
      val energies = new Array[Double](Bands)
      var k = 0
      while (k < Bands) {
        val f = FLo * math.pow(FHi / FLo, k.toDouble / (Bands - 1))
        val w = 2.0 * math.Pi * f / rate
        val coeff = 2.0 * math.cos(w)
        var s1 = 0.0; var s2 = 0.0
        var t = 0
        while (t < n) {
          val s0 = mono(t) + coeff * s1 - s2
          s2 = s1; s1 = s0
          t += 1
        }
        energies(k) = s1 * s1 + s2 * s2 - coeff * s1 * s2
        k += 1
      }
      var print = 0L
      var b = 0
      while (b < Bands - 1) {
        if (energies(b + 1) > energies(b)) print |= (1L << b)
        b += 1
      }
      Some(print)
    } catch { case _: Exception => None }
    finally ais.close()
  }

  private val PrintSchema = StructType(Seq(
    StructField("id", LongType), StructField("phash", LongType)))

  /** (id, phash) fingerprints for every decodable audio payload — the
    * column is named `phash` so [[Phash.phashPairs]] consumes it as-is.
    */
  def fingerprint(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = payloads.select(col("id").cast("long"), col("payload"))
      .rdd.mapPartitions(_.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else fingerprintBytes(r.getAs[Array[Byte]](1)).map(h => Row(r.getLong(0), h))
      })
    spark.createDataFrame(rdd, PrintSchema)
  }
}
