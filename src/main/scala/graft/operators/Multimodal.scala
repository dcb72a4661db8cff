package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * / frame-sample run as partition-batched transforms.
  *
  * IMAGE payloads (an `image/` mime) decode for REAL via `javax.imageio`
  * (PNG/JPEG/GIF/BMP readers ship in every JDK — no external library):
  * width/height/band-count from the decoded raster plus an 8-bin
  * luminance-histogram feature, with undecodable bytes dropped the way a
  * production pipeline sheds corrupt files (never failing the job).
  * AUDIO payloads (an `audio/` mime) decode for REAL via
  * `javax.sound.sampled` for the JDK-native container formats
  * (WAV/AIFF/AU carrying 8/16-bit PCM): sample rate / frame count /
  * channels from the header plus an 8-bin amplitude-histogram feature.
  * VIDEO payloads (a `video/` mime) decode for REAL for the one
  * multi-frame format the JDK ships a codec for — animated GIF via the
  * same `javax.imageio` registry (`getNumImages`/`read(i)`): frame
  * count, per-frame rasters, and a luminance histogram aggregated
  * across every frame; [[frameExtract]] emits one row per sampled
  * DECODED frame (true keyframe-style sampling, not byte offsets).
  * Media mimes (`image/`, `audio/`, `video/`) always route to the real
  * decoders, and payloads their JDK codec can't parse — corrupt bytes
  * AND compressed formats with no JDK codec (mp3/aac/h264/vp9; this
  * container ships no external codec libraries) — are SHED, the way a
  * production pipeline drops undecodable files. Non-media mimes run
  * `decodeStub`, a deterministic function of the payload bytes that
  * keeps the downstream plumbing testable end-to-end. Everything
  * around the codecs is real and tested: the
  * schema contract, the mapPartitions batching shape (decoder state
  * initialized once per partition, rows streamed through it), and the
  * partitioning story (payloads hash-partition by id; decoded features
  * keep the partitioner so downstream joins are co-located).
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("sha", StringType)))

  val DecodedSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Attach a binary payload + metadata struct to any DataFrame (here the
    * payload is the utf-8 text — stands in for real image/audio bytes).
    */
  def withPayload(df: DataFrame, id: Column, bytes: Column, mime: String): DataFrame =
    df.select(
      id.as("id"),
      bytes.cast(BinaryType).as("payload"),
      struct(
        lit(mime).as("mime"),
        length(bytes.cast(BinaryType)).cast("long").as("n_bytes"),
        md5(bytes.cast(BinaryType)).as("sha")).as("meta"))

  /** Pixel budget for a single decoded image (64 Mpx ≈ a 256 MB ARGB
    * raster): a decompression bomb declaring 60000×60000 would otherwise
    * OOM the task as an uncatchable Error BEFORE any exception guard —
    * dimensions are read from the codec HEADER and checked against this
    * budget before any raster memory is allocated.
    */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Real image decode (JDK-native, no external dependency): ImageIO
    * resolves a reader from the byte signature, so mislabeled mimes still
    * decode; bytes NO reader accepts — or declaring a raster past
    * [[MaxDecodePixels]] — return None: a 100 TB crawl always contains
    * corrupt and hostile files, and the pipeline semantic is to shed
    * them, not fail the task. Feature = normalized 8-bin luminance
    * histogram (Rec. 601 integer weights — deterministic across JVMs),
    * the pixel-space analogue of the stub's byte histogram. Pixels read
    * one ROW per getRGB call (bulk color-model conversion), not one call
    * per pixel.
    */
  private def decodeImage(id: Long, payload: Array[Byte]): Option[Row] =
    try {
      // MemoryCache, not ImageIO.createImageInputStream: the default
      // (useCache=true) backs an ALREADY in-memory byte array with a
      // File.createTempFile per row — pure disk churn in the hot path,
      // and the temp file leaks until GC if anything throws before close
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          // header-only dimension probe — no raster allocation yet
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) None
          else {
            val img = reader.read(0)
            val channels = img.getRaster.getNumBands
            // Long counters: a float counter saturates at 2^24 (x+1f == x),
            // and MaxDecodePixels admits 2^26 pixels — a uniform-color
            // 8192×8192 image would silently yield a histogram summing to
            // 0.25 instead of 1.0
            val hist = new Array[Long](8)
            val rowBuf = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, rowBuf, 0, w) // sRGB, whole row at once
              var x = 0
              while (x < w) {
                val rgb = rowBuf(x)
                val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                  (rgb & 0xFF) * 114) / 1000
                hist(lum >> 5) += 1L
                x += 1
              }
              y += 1
            }
            val total = (w.toLong * h.toLong).toDouble
            Some(Row(id, w, h, channels, hist.map(c => (c / total).toFloat).toSeq))
          }
        } finally {
          reader.dispose()
          iis.close()
        }
      }
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Sample budget for a single decoded audio payload — the audio
    * analogue of [[MaxDecodePixels]], checked against the HEADER's frame
    * length × channels before any sample is read.
    */
  val MaxDecodeSamples: Long = 64L * 1024 * 1024

  /** Real audio decode for the container formats the JDK ships codecs
    * for — WAV/AIFF/AU carrying 8/16-bit PCM via `javax.sound.sampled`,
    * no external library. Mapping onto [[DecodedSchema]]: width = sample
    * rate (Hz), height = frame count, channels = channels, feature =
    * normalized 8-bin |amplitude| histogram over every sample (16-bit
    * magnitude scale; 8-bit samples lift by ×256) — the audio analogue of
    * decodeImage's luminance histogram, deterministic integer arithmetic
    * across JVMs. Compressed audio (mp3/aac/ogg) has no JDK codec and
    * sheds like corrupt bytes; samples stream through a bounded buffer,
    * never a whole-file array.
    */
  private def decodeAudio(id: Long, payload: Array[Byte]): Option[Row] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        import javax.sound.sampled.AudioFormat.Encoding
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val frames = ais.getFrameLength
        val channels = fmt.getChannels
        val ok = (enc == Encoding.PCM_SIGNED || enc == Encoding.PCM_UNSIGNED) &&
          (bits == 8 || bits == 16) && channels > 0 && fmt.getSampleRate > 0 &&
          frames >= 0 && frames * channels <= MaxDecodeSamples
        if (!ok) None
        else {
          val bytesPerSample = bits / 8
          val hist = new Array[Long](8)
          val buf = new Array[Byte](math.max(fmt.getFrameSize, 1) * 1024)
          var total = 0L
          var read = ais.read(buf)
          while (read > 0) {
            var i = 0
            while (i + bytesPerSample <= read) {
              val amp =
                if (bits == 16) {
                  val s =
                    if (fmt.isBigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xFF)).toShort
                    else ((buf(i + 1) << 8) | (buf(i) & 0xFF)).toShort
                  math.abs(s.toInt)
                } else {
                  val s = if (enc == Encoding.PCM_UNSIGNED) (buf(i) & 0xFF) - 128
                          else buf(i).toInt
                  math.abs(s) << 8
                }
              hist(math.min(7, amp >> 12)) += 1L
              total += 1L
              i += bytesPerSample
            }
            read = ais.read(buf)
          }
          if (total == 0L) None
          else Some(Row(id, math.round(fmt.getSampleRate), frames.toInt, channels,
            hist.map(c => (c / total.toDouble).toFloat).toSeq))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException | _: RuntimeException => None
    }

  /** Deterministic mono 16-bit little-endian PCM WAV synthesizer (440 Hz
    * sine at `amp`): the audio analogue of the driver testdata's
    * synthetic documents — real RIFF/WAVE bytes for exercising the REAL
    * decode path end-to-end (driver golden + specs) in a container with
    * no audio files. Pure integer/double arithmetic — byte-identical on
    * any JVM.
    */
  def synthWav(nFrames: Int, rate: Float, amp: Int): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp).toInt.toShort
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Accumulate the Rec. 601 luminance histogram of one decoded frame
    * into `hist` (row-bulk getRGB, same integer weights as decodeImage);
    * returns the frame's pixel count.
    */
  private def accumLuminance(img: java.awt.image.BufferedImage, hist: Array[Long]): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        hist(lum >> 5) += 1L
        x += 1
      }
      y += 1
    }
    w.toLong * h
  }

  /** Shared multi-frame reader plumbing for [[decodeVideo]] and
    * [[frameExtract]]: resolve a reader from the byte signature, count
    * frames, run the header-only budget pass (per-frame dims summed
    * across frames BEFORE any raster is allocated — a decompression
    * bomb declaring 10k frames of 4k×4k sheds like corrupt bytes), then
    * hand `(reader, frameCount)` to `f`. Returns None for bytes no
    * reader accepts, a zero-frame/degenerate header, or a busted
    * budget; always disposes the reader. Keeping this in ONE place is
    * what keeps decode() and frameExtract shedding the same payloads.
    */
  private def withFrameReader[A](payload: Array[Byte])(
      f: (javax.imageio.ImageReader, Int) => A): Option[A] =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false) // seekable: getNumImages needs to scan
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else {
            var totalPx = 0L
            var i = 0
            var ok = true
            while (ok && i < n) {
              val w = reader.getWidth(i)
              val h = reader.getHeight(i)
              if (w <= 0 || h <= 0) ok = false
              else { totalPx += w.toLong * h; i += 1 }
            }
            if (!ok || totalPx == 0L || totalPx > MaxDecodePixels) None
            else Some(f(reader, n))
          }
        } finally {
          reader.dispose()
          iis.close()
        }
      }
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Real multi-frame video decode for the one container the JDK has a
    * codec for (animated GIF — the `javax.imageio` GIF reader exposes
    * every frame through `getNumImages(true)` / `read(i)`). Mapping onto
    * [[DecodedSchema]]: width/height from frame 0, channels = frame
    * COUNT (the video analogue of audio's height = frame count; raster
    * band count is fixed by the format), feature = normalized 8-bin
    * luminance histogram aggregated over EVERY frame's pixels.
    * Frames are the STORED rasters: an encoder-optimized GIF stores
    * inter-frame patches (smaller rects + disposal), and those patches
    * are what's histogrammed — compositing the display surface is a
    * renderer concern this pipeline deliberately skips (the synthetic
    * corpus and most crawl GIFs store full frames).
    */
  private def decodeVideo(id: Long, payload: Array[Byte]): Option[Row] =
    withFrameReader(payload) { (reader, n) =>
      val hist = new Array[Long](8)
      var pixels = 0L
      var i = 0
      while (i < n) { pixels += accumLuminance(reader.read(i), hist); i += 1 }
      Row(id, reader.getWidth(0), reader.getHeight(0), n,
        hist.map(c => (c / pixels.toDouble).toFloat).toSeq)
    }

  /** Deterministic animated-GIF synthesizer (the video analogue of
    * [[synthWav]]): `nFrames` gray frames of `w`×`h`, frame f pixel
    * (x,y) = gray `(x*7 + y*13 + f*phase) % 256`, written through the
    * JDK's own GIF sequence writer (`prepareWriteSequence` /
    * `writeToSequence`) — real multi-frame GIF bytes, pure integer
    * arithmetic, byte-stable on a fixed JDK.
    */
  def synthGif(nFrames: Int, w: Int, h: Int, phase: Int): Array[Byte] = {
    require(nFrames > 0 && w > 0 && h > 0, s"bad gif dims ($nFrames, $w, $h)")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = (x * 7 + y * 13 + f * phase) % 256
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Deterministic two-tone PNG synthesizer (the image analogue of
    * [[synthWav]]/[[synthGif]]): `w`×`h`, the first `split` pixels
    * (row-major) at gray `loGray`, the rest at `hiGray`, through the
    * JDK's own PNG writer — real IHDR/IDAT bytes, pure integer
    * arithmetic.
    */
  def synthPng(w: Int, h: Int, split: Int, loGray: Int, hiGray: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad png dims ($w, $h)")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < w * h) {
      val g = if (i < split) loGray else hiGray
      img.setRGB(i % w, i / w, (g << 16) | (g << 8) | g)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val FrameSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frame_sha", StringType)))

  /** REAL frame extraction: every `stride`-th DECODED frame of each
    * multi-frame payload (animated GIF via ImageIO) becomes one output
    * row with its raster dims and an md5 over the frame's Rec. 601
    * luminance bytes (row-major — pixel identity independent of the
    * LZW/palette encoding details, where hashing the compressed bytes
    * would not be; frames are the STORED rasters, so an
    * encoder-optimized GIF's inter-frame patches hash as patches — see
    * decodeVideo's caveat). Payloads no reader accepts, or past the
    * pixel budget, shed exactly like [[decode]]'s corrupt files (the
    * shared [[withFrameReader]] guarantees the two shed identically).
    * Partition-batched: rasters are decoded and released one frame at
    * a time — memory is one frame, not one video. [[frameSample]]
    * remains the byte-stride STUB for formats with no JDK codec.
    */
  def frameExtract(payloads: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive (got $stride)")
    val spark = payloads.sparkSession
    val rdd = payloads.select(col("id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null) Iterator.empty
          else withFrameReader(payload) { (reader, n) =>
            val out = Seq.newBuilder[Row]
            var f = 0
            var idx = 0
            while (f < n) {
              val img = reader.read(f)
              val w = img.getWidth
              val h = img.getHeight
              val lum = new Array[Byte](w * h)
              val rowBuf = new Array[Int](w)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, rowBuf, 0, w)
                var x = 0
                while (x < w) {
                  val rgb = rowBuf(x)
                  lum(y * w + x) = ((((rgb >> 16) & 0xFF) * 299 +
                    ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000).toByte
                  x += 1
                }
                y += 1
              }
              md.reset()
              out += Row(id, idx, w, h, md.digest(lum).map(b => f"$b%02x").mkString)
              idx += 1
              f += stride
            }
            out.result()
          }.getOrElse(Seq.empty).iterator
        }
      }
    spark.createDataFrame(rdd, FrameSchema)
  }

  /** STUB decode for NON-media mimes (text/application payloads, where
    * the driver's oracle replays this exact formula): derives (width,
    * height, channels, 8-dim feature) deterministically from the bytes
    * so the pipeline is testable end-to-end. Media mimes never reach
    * it — `decode` routes them to the real codecs, and undecodable
    * payloads (including compressed formats a real deployment would
    * open via an ffmpeg JNI bridge per partition) shed there instead.
    */
  private def decodeStub(id: Long, payload: Array[Byte]): Row = {
    val n = payload.length
    val width = (n % 640) + 1
    val height = ((n.toLong * 7) % 480).toInt + 1 // Int math overflows past ~306 MB
    // fake "feature": normalized byte histogram over 8 buckets. Long
    // counters + double normalize, same rationale as decodeImage — a
    // float counter silently saturates at 2^24 bytes in one bucket
    val hist = new Array[Long](8)
    payload.foreach(b => hist(((b & 0xFF) >> 5)) += 1L)
    val total = math.max(n, 1).toDouble
    Row(id, width, height, 3, hist.map(c => (c / total).toFloat).toSeq)
  }

  /** Partition-batched decode: one decoder per partition, rows streamed
    * through it (no per-row init, no driver collect). Routes on the meta
    * mime: `image/` decodes for real through ImageIO, `audio/` through
    * javax.sound.sampled, `video/` through the multi-frame ImageIO path
    * (undecodable rows dropped); other mimes run the deterministic
    * stub. ImageIO's reader
    * registry is per-JVM — the per-partition "open" is the registry
    * lookup each payload's signature performs.
    */
  def decode(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = payloads
      .select(col("id").cast("long"), col("payload"), col("meta.mime").as("mime"))
      .rdd
      .mapPartitions { rows =>
        // real audio/video impl: val decoder = Codec.open(); closed by completion
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val mime = r.getString(2)
          // a null payload has nothing to decode — shed it like corrupt
          // bytes (featureExtract applies the same guard); the stub would
          // otherwise NPE and fail the job
          if (payload == null) None
          else if (mime != null && mime.startsWith("image/")) decodeImage(id, payload)
          else if (mime != null && mime.startsWith("audio/")) decodeAudio(id, payload)
          else if (mime != null && mime.startsWith("video/")) decodeVideo(id, payload)
          else Some(decodeStub(id, payload))
        }
      }
    spark.createDataFrame(rdd, DecodedSchema)
  }

  /** Frame sampling for "video" payloads: every `stride`-th byte offset
    * becomes a frame marker (stub for keyframe extraction); output is one
    * row per sampled frame with its byte slice hash.
    */
  def frameSample(payloads: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive (got $stride)")
    payloads
      .filter(length(col("payload")) > 0) // an empty payload has no frames
      .select(col("id"), col("payload"),
        posexplode(sequence(lit(0),
          greatest(floor((length(col("payload")) - 1) / stride), lit(0)))))
      .withColumn("offset", (col("col") * stride).cast("long"))
      .select(
        col("id"), col("pos").cast("int").as("frame_idx"), col("offset"),
        md5(expr(s"substring(payload, CAST(offset AS INT) + 1, $stride)")).as("frame_sha"))
  }

  val FeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("feature", ArrayType(DoubleType, containsNull = false))))

  /** Feature extraction: payload → `dim`-d L2-normalized feature vector,
    * partition-batched like [[decode]] (extractor state initialized once
    * per partition). The kernel here is a REAL, deterministic one — a
    * code-point histogram mod `dim` over the payload text — standing
    * where an image/audio embedder would plug in; its output feeds the
    * similarity operators directly (kNN join, IVF/IVF-PQ artifacts,
    * embedding near-dup), which is the point of the pipeline: bytes →
    * features → ANN. Rows whose payload yields no code points (empty
    * payload) are dropped — they have no direction to normalize.
    */
  def featureExtract(payloads: DataFrame, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive (got $dim)")
    val spark = payloads.sparkSession
    val rdd = payloads.select(col("id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        // real impl: val model = Embedder.load(); closed by completion
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]](1)
          val hist = new Array[Double](dim)
          var n = 0L
          if (payload != null) { // null payload: nothing to embed
            val it = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
              .codePoints().iterator()
            while (it.hasNext) { hist(it.nextInt() % dim) += 1.0; n += 1 }
          }
          if (n == 0) None
          else {
            var ss = 0.0
            var i = 0
            while (i < dim) { ss += hist(i) * hist(i); i += 1 }
            val norm = math.sqrt(ss)
            i = 0
            while (i < dim) { hist(i) /= norm; i += 1 }
            Some(Row(r.getLong(0), hist.toSeq))
          }
        }
      }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  /** REAL pixel resize for image payloads: decode via ImageIO, box-filter
    * downscale so `max(width, height) <= maxDim` (aspect preserved,
    * ceil'd like [[resizeStub]]), re-encode PNG, refresh the meta struct
    * from the new bytes. The filter is explicit integer accumulation —
    * each input pixel bins into output cell `(x*tw/w, y*th/h)` and cells
    * average their bins per channel — NOT Graphics2D rendering, so the
    * output bytes are a pure function of the input raster (goldens stay
    * byte-stable; a uniform image resizes to exactly itself). Images
    * already inside the cap pass through BYTE-IDENTICAL (no decode+
    * re-encode churn — at 100 TB most of a crawl is already small), and
    * payloads no reader accepts shed like [[decode]]'s corrupt files.
    * Partition-batched with one-frame memory, same as the decoders.
    */
  def resizeImage(payloads: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive (got $maxDim)")
    val spark = payloads.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", MetaSchema)))
    val rdd = payloads.select(col("id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def meta(bytes: Array[Byte], mime: String): Row = {
          md.reset()
          Row(mime, bytes.length.toLong,
            md.digest(bytes).map(b => f"$b%02x").mkString)
        }
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null) None
          else try {
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) { iis.close(); None }
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val w = reader.getWidth(0)
                val h = reader.getHeight(0)
                if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) None
                else if (w <= maxDim && h <= maxDim)
                  // pass-through keeps the ORIGINAL bytes — report their
                  // actual container, not the re-encode target
                  Some(Row(id, payload, meta(payload,
                    "image/" + reader.getFormatName.toLowerCase(java.util.Locale.ROOT))))
                else {
                  val img = reader.read(0)
                  val scale = math.min(maxDim.toDouble / w, maxDim.toDouble / h)
                  // ceil + clamp: the resizeStub contract, double rounding
                  // can put w*scale one ulp above maxDim
                  val tw = math.min(math.ceil(w * scale).toInt, maxDim)
                  val th = math.min(math.ceil(h * scale).toInt, maxDim)
                  val sumR = new Array[Long](tw * th)
                  val sumG = new Array[Long](tw * th)
                  val sumB = new Array[Long](tw * th)
                  val cnt = new Array[Long](tw * th)
                  val rowBuf = new Array[Int](w)
                  var y = 0
                  while (y < h) {
                    img.getRGB(0, y, w, 1, rowBuf, 0, w)
                    // oy/ox via long multiply: x*tw overflows Int only past
                    // 2^31/tw pixels wide, but the long form is free here
                    val oy = (y.toLong * th / h).toInt
                    var x = 0
                    while (x < w) {
                      val cell = oy * tw + (x.toLong * tw / w).toInt
                      val rgb = rowBuf(x)
                      sumR(cell) += (rgb >> 16) & 0xFF
                      sumG(cell) += (rgb >> 8) & 0xFF
                      sumB(cell) += rgb & 0xFF
                      cnt(cell) += 1
                      x += 1
                    }
                    y += 1
                  }
                  val out = new java.awt.image.BufferedImage(
                    tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
                  var cell = 0
                  while (cell < tw * th) {
                    val n = math.max(cnt(cell), 1L)
                    out.setRGB(cell % tw, cell / tw,
                      (((sumR(cell) / n).toInt) << 16) |
                        (((sumG(cell) / n).toInt) << 8) | (sumB(cell) / n).toInt)
                    cell += 1
                  }
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(out, "png", bos)
                  val bytes = bos.toByteArray
                  Some(Row(id, bytes, meta(bytes, "image/png")))
                }
              } finally {
                reader.dispose()
                iis.close()
              }
            }
          } catch { case _: java.io.IOException | _: RuntimeException => None }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize stub: metadata-only transform over already-DECODED frames
    * ([[resizeImage]] is the real pixel path over payloads);
    * keeps the contract that resize changes meta, not identity.
    */
  def resizeStub(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim).cast("double") / col("width"),
      lit(maxDim).cast("double") / col("height"),
      lit(1.0))
    decoded
      // clamp: double rounding can put width*scale one ulp above maxDim,
      // and ceil would then exceed the cap
      .withColumn("width", least(ceil(col("width") * scale), lit(maxDim.toLong)).cast("int"))
      .withColumn("height", least(ceil(col("height") * scale), lit(maxDim.toLong)).cast("int"))
  }
}
