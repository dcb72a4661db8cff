package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("hdf5")` — the [[Hdf5]] reader as a DataSource V2
  * table, so the ann-benchmarks source composes with everything the
  * DataFrame reader API offers (schema inspection, `.load` paths, SQL
  * `CREATE TABLE ... USING hdf5`).
  *
  * Options: `path` (the .hdf5 file), `dataset` (default "train"),
  * `normalize` ("true"/"false"; default = the reference's rule, true iff
  * the file name contains "angular", loadhdf5.go:56–60), `slices`
  * (partition count; default sizes ≤128 MB of dataset bytes per task).
  *
  * The plan mirrors [[Hdf5.matrix]]: metadata and the chunk B-tree parse
  * once at planning, each [[InputPartition]] carries its row range plus
  * only its own chunk subset, and readers stream rows without
  * materializing the slice twice.
  */
final class Hdf5DataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "hdf5"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Hdf5DataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new Hdf5Table(properties.asScala.toMap)
}

object Hdf5DataSource {
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))
}

private final class Hdf5Table(props: Map[String, String])
    extends Table with SupportsRead {
  private def path: String = props.getOrElse("path",
    throw new IllegalArgumentException("hdf5 source requires a `path` option"))
  override def name(): String = s"hdf5:$path"
  override def schema(): StructType = Hdf5DataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new Hdf5ScanBuilder(merged)
  }
}

private final class Hdf5ScanBuilder(opts: Map[String, String]) extends ScanBuilder {
  override def build(): Scan = new Hdf5Scan(opts)
}

private final class Hdf5Scan(opts: Map[String, String]) extends Scan with Batch {
  private val path = opts.getOrElse("path",
    throw new IllegalArgumentException("hdf5 source requires a `path` option"))
  private val dsName = opts.getOrElse("dataset", "train")
  private val normalize = opts.get("normalize").map(_.toBoolean).getOrElse(
    new java.io.File(path).getName.contains("angular"))

  override def readSchema(): StructType = Hdf5DataSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"hdf5 $path#$dsName"

  override def planInputPartitions(): Array[InputPartition] = {
    val ds = Hdf5.datasets(path).find(_.name == dsName).getOrElse(
      throw new IllegalArgumentException(s"$path: no dataset '$dsName'"))
    // floor the partition count at the session's parallelism, like any
    // file source — a 1000-core cluster must not read 32 slices
    val floor = scala.util.Try(
      org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism)
      .getOrElse(32)
    Hdf5.planSlices(path, ds, opts.get("slices").map(_.toInt).getOrElse(0),
        defaultSlices = floor)
      .map { case (r0, r1, chunks) =>
        Hdf5Partition(path, ds, r0, r1, chunks, normalize): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new Hdf5PartitionReader(p.asInstanceOf[Hdf5Partition])
    }
}

private final case class Hdf5Partition(
    path: String, ds: Hdf5.H5Dataset, r0: Long, r1: Long,
    chunks: Seq[Hdf5.Chunk], normalize: Boolean) extends InputPartition

private final class Hdf5PartitionReader(p: Hdf5Partition)
    extends PartitionReader[InternalRow] {
  private val pre = p.ds.layout match {
    case _: Hdf5.Chunked => Some(p.chunks)
    case _ => None
  }
  // lazy block iteration (Hdf5.rowIterator): one ≤4096-row block on the
  // heap at a time, never the whole 128 MB-plan slice
  private val it = Hdf5.rowIterator(p.path, p.ds, p.r0, p.r1, pre)
  private var cur: (Long, Array[Float]) = _

  override def next(): Boolean = {
    if (!it.hasNext) false
    else {
      cur = it.next()
      // normalize HERE, once per row — get() may legally be called more
      // than once per next() and must be idempotent
      if (p.normalize) Hdf5.normalizeInPlace(cur._2)
      true
    }
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      cur._1, UnsafeArrayData.fromPrimitiveArray(cur._2)))

  override def close(): Unit = ()
}
