package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom data-skipping index — point lookups on a
  * high-cardinality column WITHOUT scanning the table. Partition
  * directories prune low-cardinality predicates and z-order tightens
  * min/max ranges, but an equality probe on an id-like column (doc_id,
  * uuid, url-hash) over a 100 TB table still touches every file whose
  * [min,max] straddles the value. The lakehouse answer (Delta/Iceberg
  * bloom filter indexes; the reference's analogue is its per-shard id
  * bucket, shard/shard.go point lookups) is one Bloom filter PER FILE:
  * a probe consults the index — one bounded row per file — and reads
  * only the files whose filter fires; a Bloom miss is definitive, so
  * skipped files provably contain no match and the result set is
  * byte-identical to the full scan's.
  *
  * Build: one scan of the table grouping fixed-seed key hashes by
  * `input_file_name()` through the same OR-fold aggregator as
  * [[BloomDedup]] — map-side partials, shuffle bounded by files × filter
  * bytes. The index is an ordinary DataFrame (persist it as parquet next
  * to the data). Probe: the VALUE is hashed with the same xxhash64
  * expressions ON the index frame (so Scala never re-implements the
  * hash), matching file paths collect (bounded by file count), and the
  * reader opens only those with the exact predicate still applied —
  * false positives cost I/O, never correctness.
  */
object Skipping {

  import BloomDedup.{BloomAgg, KeyedHashes}

  /** One row per data file: (file, words, bits_k). `expectedPerFile`
    * sizes each filter (overestimating only lowers the realized fpp).
    */
  def buildIndex(spark: SparkSession, dataPath: String, keyName: String,
      expectedPerFile: Long, fpp: Double): DataFrame = {
    import spark.implicits._
    val (words, k) = BloomDedup.sizing(expectedPerFile, fpp, buckets = 1)
    val data = spark.read.parquet(dataPath)
    require(data.columns.contains(keyName), s"no column '$keyName' in $dataPath")
    data
      .filter(col(keyName).isNotNull)
      .select(
        input_file_name().as("file"),
        xxhash64(col(keyName), lit("graft-bloom-h1")).as("h1"),
        xxhash64(col(keyName), lit("graft-bloom-h2")).as("h2"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => KeyedHashes(0, r._2, r._3))
      .agg(new BloomAgg(words, k).toColumn.name("bloom"))
      .toDF("file", "bloom")
      .select(col("file"), col("bloom.words").as("words"), lit(k).as("bits_k"))
  }

  /** Files that MAY contain `value` for the indexed key — a subset of all
    * files that provably contains every true match. The probe value is
    * hashed by the same xxhash64 Columns the build used, cast to the
    * key's own type first (xxhash64 of 123 as INT and as BIGINT differ).
    */
  def filesFor(index: DataFrame, value: Column): Seq[String] = {
    val spark = index.sparkSession
    import spark.implicits._
    val mightContain = udf((words: Seq[Long], k: Int, h1: Long, h2: Long) =>
      BloomDedup.hasBits(words.toArray, h1, h2, k))
    index
      .withColumn("_h1", xxhash64(value, lit("graft-bloom-h1")))
      .withColumn("_h2", xxhash64(value, lit("graft-bloom-h2")))
      .filter(mightContain(col("words"), col("bits_k"), col("_h1"), col("_h2")))
      .select("file").as[String].collect().toSeq
  }

  /** Point lookup through the index: read ONLY the may-contain files,
    * with the exact predicate still applied (Bloom false positives cost
    * I/O, never rows). Returns an empty frame with the data's schema
    * when no file can match.
    */
  def readPoint(spark: SparkSession, dataPath: String, index: DataFrame,
      keyName: String, value: Any): DataFrame = {
    val schema = spark.read.parquet(dataPath).schema
    val keyType = schema(keyName).dataType
    val probe = lit(value).cast(keyType)
    val files = filesFor(index, probe)
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*).filter(col(keyName) === probe)
  }

  /** Incremental maintenance: index only the files `existing` doesn't
    * cover (an append-only table grows by whole files, so a refresh
    * scans JUST the new data — the existing rows are carried over
    * verbatim, never recomputed). Result equals a full [[buildIndex]]
    * rebuild; deleted files' rows are dropped so the index never points
    * at vanished paths. Size the new filters with the SAME
    * (expectedPerFile, fpp) as the original build — mixed sizings would
    * make per-file fpp uneven.
    */
  def updateIndex(spark: SparkSession, dataPath: String, existing: DataFrame,
      keyName: String, expectedPerFile: Long, fpp: Double): DataFrame = {
    import spark.implicits._
    val current = spark.read.parquet(dataPath)
      .select(input_file_name().as("file")).distinct()
    val newFiles = current.join(existing.select("file"), Seq("file"), "left_anti")
      .as[String].collect()
    val kept = existing.join(current, Seq("file"), "left_semi")
    if (newFiles.isEmpty) kept
    else {
      val (words, k) = BloomDedup.sizing(expectedPerFile, fpp, buckets = 1)
      val fresh = spark.read.parquet(newFiles: _*)
        .filter(col(keyName).isNotNull)
        .select(
          input_file_name().as("file"),
          xxhash64(col(keyName), lit("graft-bloom-h1")).as("h1"),
          xxhash64(col(keyName), lit("graft-bloom-h2")).as("h2"))
        .as[(String, Long, Long)]
        .groupByKey(_._1)
        .mapValues(r => KeyedHashes(0, r._2, r._3))
        .agg(new BloomAgg(words, k).toColumn.name("bloom"))
        .toDF("file", "bloom")
        .select(col("file"), col("bloom.words").as("words"), lit(k).as("bits_k"))
      kept.unionByName(fresh)
    }
  }

  // ---- zone maps: the RANGE complement to the Bloom point index ---------

  /** Per-file (min, max) of each listed column — the zone map every
    * columnar engine keeps per chunk, materialized as a queryable frame.
    * One scan, one bounded row per file. Pairs with [[Layout.zorder]]:
    * a z-clustered write makes these ranges tight on EVERY clustered
    * dimension, so range probes on any of them skip most files.
    */
  def buildZoneMap(spark: SparkSession, dataPath: String,
      keyNames: Seq[String]): DataFrame = {
    require(keyNames.nonEmpty, "need at least one zone-map column")
    val data = spark.read.parquet(dataPath)
    keyNames.foreach(kn =>
      require(data.columns.contains(kn), s"no column '$kn' in $dataPath"))
    val aggs = keyNames.flatMap(kn =>
      Seq(min(col(kn)).as(s"min_$kn"), max(col(kn)).as(s"max_$kn")))
    data.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] on `keyName` intersects [lo, hi]. A file
    * whose zone excludes the range provably holds no match.
    */
  def filesForRange(zoneMap: DataFrame, keyName: String,
      lo: Column, hi: Column): Seq[String] = {
    val spark = zoneMap.sparkSession
    import spark.implicits._
    zoneMap
      .filter(col(s"max_$keyName") >= lo && col(s"min_$keyName") <= hi)
      .select("file").as[String].collect().toSeq
  }

  /** Range scan through the zone map: open only intersecting files, with
    * the exact BETWEEN still applied — byte-identical to the full scan.
    */
  def readRange(spark: SparkSession, dataPath: String, zoneMap: DataFrame,
      keyName: String, lo: Any, hi: Any): DataFrame = {
    val schema = spark.read.parquet(dataPath).schema
    val t = schema(keyName).dataType
    val (l, h) = (lit(lo).cast(t), lit(hi).cast(t))
    val files = filesForRange(zoneMap, keyName, l, h)
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
      .filter(col(keyName) >= l && col(keyName) <= h)
  }
}
