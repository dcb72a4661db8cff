package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal pure-JVM HDF5 reader for the ann-benchmarks file shape
  * (reference internal/loadhdf5/loadhdf5.go:30–70 — open file, read the
  * 2-D float "train" dataset, cosine-normalize when the file name
  * contains "angular").
  *
  * The container has no HDF5 library, so this implements the subset of
  * the PUBLIC "HDF5 File Format Specification Version 3.0" that
  * libhdf5/h5py emit by default for such files:
  *
  *  - superblock version 0/1 (the h5py default; v2/v3 superblocks are
  *    detected and rejected with a clear error),
  *  - version-1 object headers with continuation blocks,
  *  - symbol-table groups (v1 B-tree over SNOD nodes + local heap),
  *  - dataspace messages v1/v2, fixed-point and IEEE-float datatypes
  *    (little-endian), data layout message v3 (contiguous and chunked),
  *  - chunked storage indexed by a v1 B-tree, with the deflate (gzip)
  *    and shuffle filters.
  *
  * Scale note: HDF5 is a single-file format, so METADATA (superblock,
  * headers, chunk B-tree — a few KB) parses on the driver, while DATA is
  * read by executors in row-range slices ([[matrix]]): each task seeks
  * into its own byte range (contiguous) or inflates only the chunks that
  * intersect its rows (chunked). A 1000-executor cluster therefore
  * ingests one big HDF5 file in parallel off a shared filesystem without
  * ever materializing it on the driver.
  */
object Hdf5 {

  sealed trait DType { def size: Int }
  case object F32 extends DType { val size = 4 }
  case object F64 extends DType { val size = 8 }
  case object I32 extends DType { val size = 4 }
  case object I64 extends DType { val size = 8 }

  /** One stored chunk: logical element offsets per dim, file address,
    * stored (possibly compressed) byte count, per-chunk filter mask.
    */
  final case class Chunk(offs: Array[Long], addr: Long, nbytes: Int, mask: Int)

  sealed trait Layout
  final case class Contiguous(addr: Long, nbytes: Long) extends Layout
  /** `chunkDims` excludes the trailing element-size dim; `filters` are
    * filter ids in PIPELINE order (applied in reverse on read).
    */
  final case class Chunked(chunkDims: Array[Int], btreeAddr: Long, filters: Seq[Int])
      extends Layout

  final case class H5Dataset(
      name: String, dims: Array[Long], dtype: DType, layout: Layout) {
    def rows: Long = dims(0)
    def cols: Long = if (dims.length > 1) dims(1) else 1L
  }

  private val Undef = -1L // all-ones "undefined address"
  private val DeflateId = 1
  private val ShuffleId = 2

  private final class Reader(raf: RandomAccessFile) {
    def at(off: Long, n: Int): ByteBuffer = {
      val a = new Array[Byte](n)
      raf.seek(off)
      raf.readFully(a)
      ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
    }
  }

  private def u16(b: ByteBuffer): Int = b.getShort & 0xFFFF
  private def u32(b: ByteBuffer): Long = b.getInt & 0xFFFFFFFFL

  /** Parse the file's dataset directory (driver-side; metadata only). */
  def datasets(path: String): Seq[H5Dataset] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val r = new Reader(raf)
      val sig = r.at(0L, 9)
      val magic = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
      require((0 until 8).forall(i => sig.get(i) == magic(i)), s"not an HDF5 file: $path")
      val sbVer = sig.get(8) & 0xFF
      require(sbVer <= 1,
        s"unsupported HDF5 superblock version $sbVer (h5py default files use v0; " +
          "v2/v3 object-header-v2 files are out of this reader's declared subset)")
      val head = r.at(0L, 64)
      head.position(13)
      val so = head.get() & 0xFF; val sl = head.get() & 0xFF
      require(so == 8 && sl == 8, s"unsupported offset/length sizes ($so/$sl)")
      // v1 inserts 4 bytes (indexed-storage k + reserved) before the flags
      val rootEntryOff = (if (sbVer == 1) 28 else 24) + 4 * 8L
      val ent = r.at(rootEntryOff, 40)
      ent.getLong() // link name offset
      val rootHdr = ent.getLong()
      val cacheType = ent.getInt()
      ent.getInt()
      val (btAddr, heapAddr) =
        if (cacheType == 1) (ent.getLong(), ent.getLong())
        else {
          val m = parseHeader(r, rootHdr)
          val st = m.find(_._1 == 0x0011).getOrElse(
            sys.error("root group has no symbol table message"))._2
          (st.getLong(), st.getLong())
        }
      val heapSeg: Array[Byte] = {
        val h = r.at(heapAddr, 32)
        require(h.getInt() == leMagic("HEAP"), "bad local heap signature")
        h.position(8) // ver + reserved
        val segSize = h.getLong()
        h.getLong() // free list head
        val dataAddr = h.getLong()
        val b = r.at(dataAddr, segSize.toInt)
        val a = new Array[Byte](segSize.toInt)
        b.get(a); a
      }
      def heapName(off: Long): String = {
        var p = off.toInt
        val sb = new StringBuilder
        while (p < heapSeg.length && heapSeg(p) != 0) { sb.append(heapSeg(p).toChar); p += 1 }
        sb.toString
      }
      // walk the group B-tree down to SNOD leaves
      def walkGroup(addr: Long): Seq[(String, Long)] = {
        val hd = r.at(addr, 24)
        val sigWord = hd.getInt()
        if (sigWord == leMagic("SNOD")) {
          val n = { hd.position(6); u16(hd) }
          val body = r.at(addr + 8, n * 40)
          (0 until n).map { _ =>
            val nameOff = body.getLong(); val oh = body.getLong()
            body.position(body.position() + 24)
            (heapName(nameOff), oh)
          }
        } else {
          require(sigWord == leMagic("TREE"), "bad group B-tree signature")
          val nodeType = hd.get() & 0xFF
          require(nodeType == 0, s"unexpected B-tree node type $nodeType in group walk")
          hd.get() // level (children parse by their own signature)
          val used = u16(hd)
          val body = r.at(addr + 24, 8 + used * 16)
          body.getLong() // key 0
          (0 until used).flatMap { _ =>
            val child = body.getLong(); body.getLong() // key i+1
            walkGroup(child)
          }
        }
      }
      walkGroup(btAddr).map { case (name, hdrAddr) =>
        parseDataset(r, name, hdrAddr)
      }
    } finally raf.close()
  }

  /** Gather (type → data) pairs from a v1 object header, following
    * continuation messages.
    */
  private def parseHeader(r: Reader, addr: Long): Seq[(Int, ByteBuffer)] = {
    val pre = r.at(addr, 16)
    val ver = pre.get() & 0xFF
    require(ver == 1,
      s"unsupported object header version $ver (v2 'OHDR' headers are out of " +
        "this reader's declared subset)")
    pre.get()
    val nmsgs = u16(pre)
    pre.getInt()
    val hdrSize = u32(pre).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, ByteBuffer)]
    var blocks = List((addr + 16, hdrSize))
    var remaining = nmsgs
    while (blocks.nonEmpty && remaining > 0) {
      val (bAddr, bLen) = blocks.head
      blocks = blocks.tail
      val b = r.at(bAddr, bLen)
      while (b.remaining() >= 8 && remaining > 0) {
        val t = u16(b)
        val sz = u16(b)
        b.position(b.position() + 4) // flags + reserved
        val data = b.slice().order(ByteOrder.LITTLE_ENDIAN)
        data.limit(sz)
        // v1 messages are 8-byte aligned; libhdf5 writes padded sizes
        val padded = (sz + 7) / 8 * 8
        b.position(math.min(b.position() + padded, b.limit()))
        remaining -= 1
        if (t == 0x0010) {
          val c = data.duplicate().order(ByteOrder.LITTLE_ENDIAN)
          blocks = (c.getLong(), c.getLong().toInt) :: blocks
        } else if (t != 0x0000) out += ((t, data))
      }
    }
    out.toSeq
  }

  private def parseDataset(r: Reader, name: String, hdrAddr: Long): H5Dataset = {
    val msgs = parseHeader(r, hdrAddr)
    def one(t: Int, what: String): ByteBuffer =
      msgs.find(_._1 == t).getOrElse(sys.error(s"dataset $name: no $what message"))._2

    // dataspace (0x0001), v1 or v2
    val sp = one(0x0001, "dataspace")
    val spVer = sp.get() & 0xFF
    val rank = sp.get() & 0xFF
    sp.get() // flags (maxdims presence — maxdims trail the dims; not needed)
    if (spVer == 1) sp.position(sp.position() + 5) else sp.position(sp.position() + 1)
    val dims = Array.fill(rank)(sp.getLong())
    require(rank >= 1 && rank <= 2, s"dataset $name: rank $rank unsupported (1-D/2-D only)")

    // datatype (0x0003)
    val dt = one(0x0003, "datatype")
    val cv = dt.get() & 0xFF
    val cls = cv & 0xF
    val bits0 = dt.get() & 0xFF
    dt.get(); dt.get()
    val esize = u32(dt).toInt
    require((bits0 & 1) == 0, s"dataset $name: big-endian data unsupported")
    val dtype = (cls, esize) match {
      case (1, 4) => F32
      case (1, 8) => F64
      case (0, 4) => I32
      case (0, 8) => I64
      case _ => sys.error(s"dataset $name: datatype class $cls size $esize unsupported")
    }

    // layout (0x0008), v3
    val lo = one(0x0008, "data layout")
    val loVer = lo.get() & 0xFF
    require(loVer == 3, s"dataset $name: layout message v$loVer unsupported (v3 only)")
    val layout = (lo.get() & 0xFF) match {
      case 1 =>
        val addr = lo.getLong(); val sz = lo.getLong()
        Contiguous(addr, sz)
      case 2 =>
        val ndims = lo.get() & 0xFF // rank + 1 (element-size dim)
        val bt = lo.getLong()
        val cdims = Array.fill(ndims)(u32(lo).toInt)
        val filters = msgs.find(_._1 == 0x000B).map(parseFilters(name, _)).getOrElse(Nil)
        Chunked(cdims.dropRight(1), bt, filters)
      case c => sys.error(s"dataset $name: layout class $c unsupported (contiguous/chunked only)")
    }
    H5Dataset(name, dims, dtype, layout)
  }

  private def parseFilters(name: String, m: (Int, ByteBuffer)): Seq[Int] = {
    val b = m._2
    val ver = b.get() & 0xFF
    val n = b.get() & 0xFF
    if (ver == 1) b.position(b.position() + 6) // 2 + 4 reserved
    (0 until n).map { _ =>
      val id = u16(b)
      val nameLen = if (ver == 2 && id < 256) 0 else u16(b)
      b.position(b.position() + 2) // flags
      val ncd = u16(b)
      val namePad = if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen
      b.position(b.position() + namePad + 4 * ncd)
      if (ver == 1 && ncd % 2 == 1) b.position(b.position() + 4)
      require(id == DeflateId || id == ShuffleId,
        s"dataset $name: filter id $id unsupported (deflate/shuffle only)")
      id
    }
  }

  /** Chunk directory via the v1 raw-data B-tree (driver-side; a few KB). */
  private def chunkIndex(r: Reader, rank: Int, addr: Long): Seq[Chunk] = {
    if (addr == Undef) return Nil
    val hd = r.at(addr, 24)
    require(hd.getInt() == leMagic("TREE"), "bad chunk B-tree signature")
    val nodeType = hd.get() & 0xFF
    require(nodeType == 1, s"unexpected B-tree node type $nodeType in chunk walk")
    val level = hd.get() & 0xFF
    val used = u16(hd)
    val keyLen = 8 + (rank + 1) * 8
    val body = r.at(addr + 24, (used + 1) * keyLen + used * 8)
    (0 until used).flatMap { _ =>
      val sz = body.getInt(); val mask = body.getInt()
      val offs = Array.fill(rank + 1)(body.getLong()).dropRight(1)
      val child = body.getLong()
      if (level == 0) Seq(Chunk(offs, child, sz, mask))
      else chunkIndex(r, rank, child)
    }
  }

  /** Read rows [r0, r1) of a 2-D (or 1-D) dataset as doubles — runs on
    * whatever node calls it; tasks call it with their own slice.
    * `preChunks` carries a driver-parsed chunk subset so a fleet of
    * tasks doesn't re-walk the full chunk B-tree once each (O(tasks ×
    * chunks) at a million-chunk file); when None, the B-tree is parsed
    * here (the single-caller convenience path).
    */
  def readRows(path: String, ds: H5Dataset, r0: Long, r1: Long,
      preChunks: Option[Seq[Chunk]] = None): Array[Array[Double]] = {
    require(r0 >= 0 && r1 <= ds.rows && r0 <= r1, s"row range [$r0,$r1) out of [0,${ds.rows})")
    val nCols = ds.cols.toInt
    val es = ds.dtype.size
    val out = Array.ofDim[Double]((r1 - r0).toInt, nCols)
    val raf = new RandomAccessFile(path, "r")
    try {
      val r = new Reader(raf)
      ds.layout match {
        case Contiguous(addr, _) =>
          require(addr != Undef, s"dataset ${ds.name}: no data allocated")
          val rowBytes = nCols.toLong * es
          // read in ≤64 MB row blocks: a task slice of a 100 TB-scale file
          // must never need a >2 GB (or even multi-GB) driver of heap
          val blockRows = math.max(1L, (64L << 20) / rowBytes)
          var base = r0
          while (base < r1) {
            val hi = math.min(r1, base + blockRows)
            val buf = r.at(addr + base * rowBytes, ((hi - base) * rowBytes).toInt)
            var i = (base - r0).toInt
            val iHi = (hi - r0).toInt
            while (i < iHi) {
              var j = 0
              while (j < nCols) { out(i)(j) = readElem(buf, ds.dtype); j += 1 }
              i += 1
            }
            base = hi
          }
        case ch @ Chunked(cdims, bt, _) =>
          val chunks = preChunks.getOrElse(chunkIndex(r, ds.dims.length, bt))
          val cRows = cdims(0).toLong
          val cCols = if (cdims.length > 1) cdims(1).toLong else 1L
          chunks.foreach { c =>
            val rowOff = c.offs(0)
            val colOff = if (c.offs.length > 1) c.offs(1) else 0L
            if (rowOff < r1 && rowOff + cRows > r0) {
              val raw = decodeChunk(r, c, ch, (cRows * cCols).toInt * es)
              val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
              val rLo = math.max(r0, rowOff); val rHi = math.min(r1, rowOff + cRows)
              val jHi = math.min(nCols.toLong, colOff + cCols)
              var i = rLo
              while (i < rHi) {
                var j = colOff
                while (j < jHi) {
                  b.position((((i - rowOff) * cCols + (j - colOff)) * es).toInt)
                  out((i - r0).toInt)(j.toInt) = readElem(b, ds.dtype)
                  j += 1
                }
                i += 1
              }
            }
          }
      }
    } finally raf.close()
    out
  }

  private def readElem(b: ByteBuffer, dt: DType): Double = dt match {
    case F32 => b.getFloat.toDouble
    case F64 => b.getDouble
    case I32 => b.getInt.toDouble
    case I64 => b.getLong.toDouble
  }

  private def decodeChunk(r: Reader, c: Chunk, lay: Chunked, plainBytes: Int): Array[Byte] = {
    var data = { val b = r.at(c.addr, c.nbytes); val a = new Array[Byte](c.nbytes); b.get(a); a }
    // filters run in pipeline order on write; undo in reverse, honoring
    // the per-chunk skip mask (bit i set = filter i skipped for this chunk)
    lay.filters.zipWithIndex.reverse.foreach { case (id, i) =>
      if ((c.mask & (1 << i)) == 0) id match {
        case DeflateId =>
          val inf = new Inflater()
          inf.setInput(data)
          val out = new Array[Byte](plainBytes)
          var off = 0
          while (!inf.finished() && off < plainBytes) {
            val n = inf.inflate(out, off, plainBytes - off)
            // a truncated stream makes inflate() return 0 with the input
            // exhausted (and an FDICT stream stalls on needsDictionary) —
            // raise a decode error, never spin
            if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
              sys.error(s"truncated or dictionary-requiring deflate stream in chunk at ${c.addr}")
            off += n
          }
          inf.end()
          data = out
        case ShuffleId =>
          data = unshuffle(data, elemSizeOf(lay, plainBytes))
      }
    }
    data
  }

  private def elemSizeOf(lay: Chunked, plainBytes: Int): Int = {
    val nElems = lay.chunkDims.map(_.toLong).product
    (plainBytes / nElems).toInt
  }

  /** Undo the shuffle filter: input holds es planes of n bytes each. */
  private def unshuffle(in: Array[Byte], es: Int): Array[Byte] = {
    val n = in.length / es
    val out = new Array[Byte](in.length)
    var p = 0 // plane
    while (p < es) {
      var i = 0
      while (i < n) { out(i * es + p) = in(p * n + i); i += 1 }
      p += 1
    }
    out
  }

  private def leMagic(s: String): Int =
    (s(0) | (s(1) << 8) | (s(2) << 16) | (s(3) << 24))

  // ------------------------------------------------------------------
  // Spark faces
  // ------------------------------------------------------------------

  /** Distributed matrix read: (vec_id BIGINT, embedding ARRAY<FLOAT>).
    * Metadata parses on the driver — including the chunk B-tree, ONCE,
    * so each task receives just its own chunk subset instead of
    * re-walking the index (O(tasks × chunks) on a million-chunk file).
    * Each task reads only its row range from `path` (which must be
    * visible to executors — local[?] or a shared filesystem, the same
    * contract as any file source); for chunked layouts the task bounds
    * align to chunk-row boundaries so no chunk inflates twice.
    */
  /** Plan the distributed read: row ranges (aligned to chunk-row
    * boundaries for chunked layouts, so no chunk inflates twice) plus
    * each range's own chunk subset — the chunk B-tree parses ONCE here
    * instead of once per task (O(tasks × chunks) on a million-chunk
    * file). `slices = 0` targets ≤128 MB of dataset bytes per task but
    * never fewer tasks than `defaultSlices`. Shared by [[matrix]] and the
    * DataSource V2 scan ([[Hdf5DataSource]]).
    */
  def planSlices(path: String, ds: H5Dataset, slices: Int,
      defaultSlices: Int = 32): Seq[(Long, Long, Seq[Chunk])] = {
    val n = ds.rows
    val totalBytes = n * ds.cols * ds.dtype.size
    val parts = if (slices > 0) slices
      else math.max(1L, math.min(n, math.max(
        defaultSlices.toLong, totalBytes / (128L << 20) + 1))).toInt
    val (chunkRows, allChunks) = ds.layout match {
      case Chunked(cdims, bt, _) =>
        val raf = new RandomAccessFile(path, "r")
        val cs = try chunkIndex(new Reader(raf), ds.dims.length, bt) finally raf.close()
        (cdims(0).toLong, cs)
      case _ => (0L, Nil)
    }
    val rawBounds = (0 until parts).map { p =>
      (n * p / parts, n * (p + 1) / parts)
    }
    val bounds = (if (chunkRows > 0) {
      // snap split points down to chunk-row multiples (the last stays n)
      rawBounds.map { case (a, b) =>
        (a / chunkRows * chunkRows, if (b == n) n else b / chunkRows * chunkRows)
      }
    } else rawBounds).filter(b => b._2 > b._1)
    bounds.map { case (r0, r1) =>
      val mine =
        if (chunkRows == 0) Nil
        else allChunks.filter(c => c.offs(0) < r1 && c.offs(0) + chunkRows > r0)
      (r0, r1, mine)
    }
  }

  /** float32 magnitude accumulation + float32 divide — the reference's
    * exact normalise loop (loadhdf5.go:17–27), compiled per row instead
    * of an interpreted HOF on a billion-row import path.
    */
  def normalizeInPlace(f: Array[Float]): Unit = {
    var mag = 0.0f
    var k = 0
    while (k < f.length) { mag += f(k) * f(k); k += 1 }
    mag = math.sqrt(mag.toDouble).toFloat
    if (mag > 0f) { k = 0; while (k < f.length) { f(k) /= mag; k += 1 } }
  }

  /** Lazy per-row iteration over a task's slice in ≤~4096-row blocks
    * (rounded up to a chunk-row multiple so no chunk inflates twice), so
    * a 128 MB-plan slice never sits fully materialized as boxed double
    * arrays on an executor — peak heap is one block, not one slice.
    * Shared by [[matrix]] and the DataSource V2 partition reader.
    */
  def rowIterator(path: String, ds: H5Dataset, r0: Long, r1: Long,
      pre: Option[Seq[Chunk]]): Iterator[(Long, Array[Float])] = {
    // size blocks by BYTES (~8 MB), floored at 4096 rows — narrow rows
    // must not degrade into a file open + tiny read per 4096 rows
    val rowBytes = math.max(1L, ds.cols * ds.dtype.size)
    val byRows = math.max(4096L, (8L << 20) / rowBytes)
    val block = ds.layout match {
      case Chunked(cdims, _, _) =>
        val cr = math.max(1L, cdims(0).toLong)
        (byRows + cr - 1) / cr * cr
      case _ => byRows
    }
    Iterator.range(0L, (r1 - r0 + block - 1) / block).flatMap { b =>
      val s = r0 + b * block
      val e = math.min(r1, s + block)
      val sub = pre.map(_.filter { c =>
        ds.layout match {
          case Chunked(cdims, _, _) =>
            c.offs(0) < e && c.offs(0) + cdims(0) > s
          case _ => true
        }
      })
      readRows(path, ds, s, e, sub).iterator.zipWithIndex.map { case (v, i) =>
        val f = new Array[Float](v.length)
        var j = 0
        while (j < f.length) { f(j) = v(j).toFloat; j += 1 }
        (s + i, f)
      }
    }
  }

  def matrix(spark: SparkSession, path: String, name: String,
      slices: Int = 0, normalize: Boolean = false): DataFrame = {
    val ds = datasets(path).find(_.name == name).getOrElse(
      sys.error(s"$path: no dataset '$name' (have: ${datasets(path).map(_.name).mkString(", ")})"))
    val work = planSlices(path, ds, slices,
      defaultSlices = spark.sparkContext.defaultParallelism)
    val chunked = ds.layout.isInstanceOf[Chunked]
    import spark.implicits._
    // a 0-row dataset plans zero slices; parallelize(_, 0) would throw
    if (work.isEmpty)
      return Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    spark.sparkContext.parallelize(work, work.length)
      .flatMap { case (r0, r1, mine) =>
        val pre = if (chunked) Some(mine) else None
        rowIterator(path, ds, r0, r1, pre).map { case (id, f) =>
          if (normalize) normalizeInPlace(f)
          (id, f)
        }
      }.toDF("vec_id", "embedding")
  }

  /** The reference loader's exact semantics (loadhdf5.go:30–70): read
    * "train", L2-normalize per row when the file name contains
    * "angular", metric cosine for angular files else euclidean.
    */
  def vectors(spark: SparkSession, path: String): (DataFrame, String) = {
    val angular = new java.io.File(path).getName.contains("angular")
    (matrix(spark, path, "train", normalize = angular),
      if (angular) "cosine" else "euclidean")
  }
}
