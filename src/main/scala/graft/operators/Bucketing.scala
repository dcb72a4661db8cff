package graft.operators

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Bucketed-table plumbing: the co-located join story for repeated joins
  * on a hot key. At 100 TB the dominant cost of a key-equi join is the
  * shuffle of BOTH sides; writing each side once as a bucketed, sorted
  * table makes every subsequent join/aggregate on that key exchange-free
  * — the scan itself delivers the hash distribution (and sort order)
  * the join needs, so N downstream joins pay ZERO shuffles instead of
  * 2N. This is Spark's native answer to the reference's
  * rendezvous-hashed shard placement (cluster/actions.go:275–355 routes
  * each shard's work to the server that owns it): ownership is encoded
  * in the file layout once, then every operator inherits the
  * co-location. BucketingSpec machine-checks the property the way
  * PlanLintSpec checks shapes: the joined plan contains NO
  * ShuffleExchange, and a key-equality filter prunes to 1 of N buckets.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted-within-bucket)
    * EXTERNAL parquet table at `path` registered as `table` in the
    * session catalog — external so the data sits where the caller
    * chooses (a store dir, a temp dir in tests), not the default
    * warehouse. Buckets hash on `key`; `numBuckets` is the lever that
    * must hold at scale: buckets are the unit of downstream task
    * parallelism, so size them like shuffle partitions (data / ~128 MB),
    * NOT by table count. Sorting within buckets additionally lets a
    * sort-merge join skip its per-task sort (and serves range scans).
    * `options` pass through to the parquet writer — a POINT-READ table
    * (bounded id fetches, never full scans) wants small row groups
    * (`parquet.block.size`) so a pushed `key IN (...)` skips at row-group
    * granularity inside each bucket file; the default 128 MB row group
    * makes min/max stats useless for point reads (one group spans the
    * bucket) while costing full scans nothing they'd notice.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive (got $numBuckets)")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val w: DataFrameWriter[Row] = df.write
      .mode("overwrite")
      .option("path", path)
      .options(options)
      .bucketBy(numBuckets, key)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Join two co-bucketed catalog tables on their shared bucket key.
    * When both sides were written with the SAME `numBuckets` on the join
    * key (and `spark.sql.sources.bucketing.enabled` is on, its default),
    * Catalyst plans this with no ShuffleExchange on either side — the
    * bucketed scans satisfy the join's distribution requirement
    * directly. Plain `spark.table(a).join(spark.table(b), key)` — the
    * helper exists to name the contract, not to hide machinery.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Drop the catalog entries (external data stays for the caller to
    * clean) — tests and per-run queries must not leak table names into
    * the shared session catalog.
    */
  def drop(spark: SparkSession, tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))

  /** Directory-partitioned parquet layout — the complement to hash
    * bucketing for LOW-cardinality predicate columns (day, event type,
    * tenant): `partitionBy` encodes the column into the directory tree,
    * so a filter on it prunes whole directories at PLANNING time
    * (`PartitionFilters` in the scan — zero files of the excluded
    * partitions are opened, vs row-group min/max skipping which still
    * reads footers). At 100 TB this is the difference between scanning
    * one day and listing a year. Keep partition columns at directory
    * cardinality (≤ thousands): a high-cardinality partition column
    * shatters the table into millions of small files — that's what
    * bucketing is for.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
