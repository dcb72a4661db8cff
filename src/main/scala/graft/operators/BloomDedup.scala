package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sharded Bloom-filter novelty check — the incremental-ingest face of
  * exact dedup: "has this content been seen in the existing corpus?"
  * answered without shuffling the corpus' keys against the batch (the
  * anti-join does that; at 100 TB the corpus side of that shuffle is the
  * whole archive, every batch). A Bloom filter is the classic answer
  * (Bloom 1970; the CCNet/RefinedWeb pipelines use exactly this shape for
  * cross-snapshot URL/content novelty), with one-sided error: a miss is
  * definitive (guaranteed novel), a hit is probable (fpp-tunable).
  *
  * Why sharded: a single filter for 10^10 keys at 1% fpp is ~12 GB — not
  * a broadcast, not a driver object. Here the bit array is split across
  * `buckets` shards keyed by an INDEPENDENT hash of the key (independent
  * of the bit-position hashes, so conditioning on the bucket doesn't bias
  * the bits). Build: one shuffle of (bucket, h1, h2) triples — 20 bytes a
  * row regardless of key size — with map-side partial OR-merge, so each
  * input partition contributes at most `buckets` buffers to the exchange,
  * not rows. Check: a typed cogroup on the bucket — each task holds ONE
  * shard's bits (mTotal/buckets) while streaming its incoming rows.
  * Determinism: bits are a pure OR-fold of fixed-seed xxhash64 positions
  * (Kirsch–Mitzenmacher double hashing), so the filter is a pure function
  * of the corpus key MULTISET — any partition layout, any arrival order.
  *
  * Reference parity: semadb dedups inserts by point UUID within a shard
  * (shard/shard.go insert exists-check); this is the corpus-scale
  * generalization a training pipeline needs.
  */
object BloomDedup {

  /** One shard's bit array (`words(i)` holds bits 64i..64i+63). */
  final case class BloomBuf(var words: Array[Long])

  final case class KeyedHashes(bucket: Int, h1: Long, h2: Long)
  final case class InRow(bucket: Int, id: Long, h1: Long, h2: Long)

  /** Kirsch–Mitzenmacher position i: (h1 + i·h2) mod mBits, sign-safe. */
  private def bitPos(h1: Long, h2: Long, i: Int, mBits: Int): Int = {
    val x = h1 + i.toLong * h2
    (((x % mBits) + mBits) % mBits).toInt
  }

  private[graft] def setBits(w: Array[Long], h1: Long, h2: Long, k: Int): Unit = {
    var i = 0
    while (i < k) {
      val p = bitPos(h1, h2, i, w.length * 64)
      w(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  private[graft] def hasBits(w: Array[Long], h1: Long, h2: Long, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = bitPos(h1, h2, i, w.length * 64)
      if ((w(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** OR-fold of key hashes into one shard's bit array. The buffer is
    * mutated in place (Aggregator contract permits it); merge ORs two
    * shards' partials — associative and commutative by construction,
    * which is what makes the result layout-independent.
    */
  final class BloomAgg(words: Int, k: Int)
      extends Aggregator[KeyedHashes, BloomBuf, BloomBuf] {
    override def zero: BloomBuf = BloomBuf(new Array[Long](words))
    override def reduce(b: BloomBuf, a: KeyedHashes): BloomBuf = {
      setBits(b.words, a.h1, a.h2, k); b
    }
    override def merge(x: BloomBuf, y: BloomBuf): BloomBuf = {
      var i = 0
      while (i < x.words.length) { x.words(i) |= y.words(i); i += 1 }
      x
    }
    override def finish(b: BloomBuf): BloomBuf = b
    override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
    override def outputEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
  }

  /** Standard sizing: total bits for `expectedItems` at `fpp`, split into
    * `buckets` shards rounded up to whole 64-bit words; k = (m/n)·ln 2.
    */
  def sizing(expectedItems: Long, fpp: Double, buckets: Int): (Int, Int) = {
    require(expectedItems > 0, s"expectedItems must be positive (got $expectedItems)")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1) (got $fpp)")
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    val ln2 = math.log(2.0)
    val mTotal = math.ceil(-expectedItems.toDouble * math.log(fpp) / (ln2 * ln2))
    // size in Long first: a Double→Int cast saturates SILENTLY, and a
    // 10^10-key filter with few buckets would otherwise mis-size or fail
    // with an opaque allocation error instead of this message
    val wordsPerBucketL = math.max(1L,
      math.ceil(mTotal / buckets / 64.0).toLong)
    require(wordsPerBucketL <= Int.MaxValue / 8, // ≤16 GiB of words per shard
      s"bloom shard needs $wordsPerBucketL words (${wordsPerBucketL * 8} bytes); " +
        s"raise `buckets` (got $buckets) so each shard's bit array fits an executor")
    val wordsPerBucket = wordsPerBucketL.toInt
    val k = math.max(1,
      math.round(wordsPerBucket.toDouble * 64 * buckets / expectedItems * ln2).toInt)
    (wordsPerBucket, k)
  }

  private def hashed(df: DataFrame, key: Column, buckets: Int): DataFrame =
    df.filter(key.isNotNull).select(
      pmod(xxhash64(key, lit("graft-bloom-bucket")), lit(buckets)).cast("int").as("bucket"),
      xxhash64(key, lit("graft-bloom-h1")).as("h1"),
      xxhash64(key, lit("graft-bloom-h2")).as("h2"))

  /** The sharded filter over `corpus`'s `key` column: one row per bucket,
    * `(bucket, words)`. Persist it once per corpus snapshot and reuse it
    * across every incoming batch.
    */
  def build(corpus: DataFrame, key: Column,
      expectedItems: Long, fpp: Double, buckets: Int): Dataset[(Int, BloomBuf)] = {
    val (words, k) = sizing(expectedItems, fpp, buckets)
    val spark = corpus.sparkSession
    import spark.implicits._
    hashed(corpus, key, buckets).as[KeyedHashes]
      .groupByKey(_.bucket)
      .agg(new BloomAgg(words, k).toColumn.name("bloom"))
  }

  /** Flag each `incoming` row: `probably_seen` = the corpus filter has
    * all k bits for its key. False ⇒ guaranteed novel (no false
    * negatives); true ⇒ seen with probability ≈ 1 − fpp. Output:
    * (id, probably_seen) — join back on id for the full row.
    */
  def novelty(bloom: Dataset[(Int, BloomBuf)], incoming: DataFrame,
      id: Column, key: Column,
      expectedItems: Long, fpp: Double, buckets: Int): DataFrame = {
    val (_, k) = sizing(expectedItems, fpp, buckets)
    val spark = incoming.sparkSession
    import spark.implicits._
    val idDt = incoming.select(id).schema.head.dataType
    require(idDt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"id must be numeric (got $idDt) — attach a long surrogate for string ids")
    val in = incoming.filter(key.isNotNull && id.isNotNull)
      .select(
        pmod(xxhash64(key, lit("graft-bloom-bucket")), lit(buckets)).cast("int").as("bucket"),
        id.cast("long").as("id"),
        xxhash64(key, lit("graft-bloom-h1")).as("h1"),
        xxhash64(key, lit("graft-bloom-h2")).as("h2"))
      .as[InRow]
    in.groupByKey(_.bucket)
      .cogroup(bloom.groupByKey(_._1)) { (_, ins, blooms) =>
        // ≤ 1 bloom row per bucket by construction; a bucket absent from
        // the corpus filter answers "novel" for every probe
        val words = blooms.toSeq.headOption.map(_._2.words)
        ins.map(r => (r.id, words.exists(w => hasBits(w, r.h1, r.h2, k))))
      }
      .toDF("id", "probably_seen")
  }

  /** Build + check in one call, for a single (corpus, batch) pair. */
  def noveltyAgainst(corpus: DataFrame, corpusKey: Column,
      incoming: DataFrame, id: Column, key: Column,
      expectedItems: Long, fpp: Double, buckets: Int = 64): DataFrame =
    novelty(build(corpus, corpusKey, expectedItems, fpp, buckets),
      incoming, id, key, expectedItems, fpp, buckets)
}
