package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * / frame-sample run as partition-batched transforms.
  *
  * The actual codec calls are STUBBED — this container ships no
  * image/audio libraries — behind `decodeStub`, a deterministic function
  * of the payload bytes. Everything around the stub is real and tested:
  * the schema contract, the mapPartitions batching shape (decoder state
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

  /** STUB decode: a real implementation opens a codec per partition and
    * decodes each payload (e.g. javax.imageio / ffmpeg via JNI). The stub
    * derives (width, height, channels, 8-dim feature) deterministically
    * from the bytes so the pipeline is testable end-to-end.
    */
  private def decodeStub(id: Long, payload: Array[Byte]): Row = {
    val n = payload.length
    val width = (n % 640) + 1
    val height = ((n.toLong * 7) % 480).toInt + 1 // Int math overflows past ~306 MB
    // fake "feature": normalized byte histogram over 8 buckets
    val hist = new Array[Float](8)
    payload.foreach(b => hist(((b & 0xFF) >> 5)) += 1f)
    val total = math.max(n, 1).toFloat
    Row(id, width, height, 3, hist.map(_ / total).toSeq)
  }

  /** Partition-batched decode: one "decoder" per partition, rows streamed
    * through it (the shape a real codec integration needs — no per-row
    * init, no driver collect).
    */
  def decode(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = payloads.select(col("id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        // real impl: val decoder = Codec.open(); closed by completion
        rows.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
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

  /** Resize stub: metadata-only transform (a real impl rewrites pixels);
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
