package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At
  * cluster scale a "table" would be a partitioned parquet/Delta directory;
  * nothing here assumes single-file inputs — `spark.read.parquet` takes
  * directories or globs equally.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` normalization: the stored parquet logical type has
    * varied across testdata generations — TIMESTAMP(NANOS) (which Spark's
    * vectorized reader only serves as raw longs under a legacy conf) and
    * plain TIMESTAMP(MICROS). Surface a microsecond-precision
    * TIMESTAMP_NTZ column regardless of the stored shape — all downstream
    * operators (windowing, date_trunc) are at second granularity or
    * coarser, so the ns→µs truncation is semantics-preserving.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // SESSION-WIDE side effect, deliberately not restored: the returned
    // frame is lazy, so the conf must still be set whenever its scans
    // actually run — there is no per-read knob for nanos handling. The
    // visible consequence: other TIMESTAMP(NANOS) parquet in the same
    // session also reads as bigint nanos after the first events() call.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: pure NTZ arithmetic — casting an
        // instant to NTZ renders in the SESSION timezone, so a non-UTC
        // consumer would shift every wall value; epoch-anchored
        // timestampadd is timezone-independent
        raw.withColumn("ts",
          expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      case TimestampNTZType => raw // micros, no zone: already the target shape
      case TimestampType => // micros instant: a plain NTZ cast renders
        // walls in the SESSION timezone — epoch-anchored arithmetic (like
        // the nanos leg) yields UTC walls under any session zone
        raw.withColumn("ts",
          expr("timestampadd(MICROSECOND, unix_micros(ts), TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      case other =>
        throw new IllegalArgumentException(s"events.ts: unsupported stored type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
