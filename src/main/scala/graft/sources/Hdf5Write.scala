package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.Deflater

import Hdf5.{DType, F32, F64, I32}

/** Minimal HDF5 WRITER for the same declared subset [[Hdf5]] reads —
  * superblock v0, one root symbol-table group, v1 object headers,
  * little-endian float/fixed-point 1-D/2-D datasets, contiguous or
  * chunked layout with optional shuffle+deflate filters (the shape
  * libhdf5/h5py emit for ann-benchmarks-style files).
  *
  * Two jobs: (a) an export sink — a collection's vectors can be handed
  * to any HDF5-consuming tool; (b) the fixture generator for Hdf5Spec
  * and the hdf5 gate query. The container has no HDF5 library, so
  * fixtures cannot come from libhdf5 itself; writer and reader are
  * implemented from the PUBLIC format spec (HDF5 File Format
  * Specification v3.0) as two independent code paths — the writer
  * assembles structures field by field, the reader re-derives them from
  * signatures/versions — and the gate query pins the decoded values to
  * a closed-form DuckDB replay, so a shared misreading of the spec that
  * changed any VALUE would fail the gate.
  */
object Hdf5Write {

  /** One dataset to write. `chunk` switches to chunked layout (rows,
    * cols per chunk); `shuffle`/`deflate` add those filters in libhdf5's
    * pipeline order (shuffle first). Filters require `chunk`.
    */
  final case class Spec(
      name: String, data: Array[Array[Double]], dtype: DType,
      chunk: Option[(Int, Int)] = None,
      shuffle: Boolean = false, deflate: Boolean = false) {
    require(data.nonEmpty, s"$name: empty dataset (HDF5 export needs at least one row)")
    require(data.forall(_.length == data(0).length), s"$name: ragged data")
    require(chunk.isDefined || (!shuffle && !deflate), s"$name: filters need chunked layout")
    def rows: Int = data.length
    def cols: Int = data(0).length
  }

  private val Undef = -1L

  def write(path: String, specsIn: Seq[Spec]): Unit = {
    val specs = specsIn.sortBy(_.name) // symbol table nodes store names in order
    // ---- plan addresses --------------------------------------------------
    val heapNames = specs.map(_.name)
    val nameOffs = {
      var off = 8L // heap data segment reserves its first 8 bytes
      heapNames.map { n => val o = off; off += pad8(n.length + 1); o }
    }
    val heapSegSize = 8L + heapNames.map(n => pad8(n.length + 1).toLong).sum

    val sbAddr = 0L
    val rootHdrAddr = 96L // superblock v0 with 8-byte offsets is 96 bytes
    val rootHdrSize = 16L + 8 + 16 // prefix + symbol-table message
    val heapAddr = rootHdrAddr + rootHdrSize
    val heapDataAddr = heapAddr + 32
    val btreeAddr = heapDataAddr + heapSegSize
    val btreeSize = 24L + 8 + 8 + 8 // one SNOD child: key0, child0, key1
    val snodAddr = btreeAddr + btreeSize
    val snodSize = 8L + specs.length * 40L

    // per-dataset: header, then chunk btree + chunk blobs or contiguous data
    final case class Plan(
        spec: Spec, hdrAddr: Long, hdrMsgsSize: Int, dataAddr: Long,
        chunks: Seq[(Array[Long], Array[Byte])], btAddr: Long, totalEnd: Long)
    var cursor = snodAddr + snodSize
    val plans = specs.map { s =>
      val filterMsg = if (s.shuffle || s.deflate) 8 + 16 * ((if (s.shuffle) 1 else 0) + (if (s.deflate) 1 else 0)) else 0
      val dtypeMsg = s.dtype match { case F32 | F64 => 24; case _ => 16 }
      val msgs = (8 + 24) + (8 + dtypeMsg) + (if (filterMsg > 0) 8 + filterMsg else 0) + (8 + 24)
      val hdrAddr = cursor
      cursor += 16 + msgs
      s.chunk match {
        case None =>
          val dataAddr = cursor
          cursor += s.rows.toLong * s.cols * s.dtype.size
          Plan(s, hdrAddr, msgs, dataAddr, Nil, Undef, cursor)
        case Some((cr, cc)) =>
          val blobs = for {
            r0 <- 0 until s.rows by cr
            c0 <- 0 until s.cols by cc
          } yield {
            val plain = ByteBuffer.allocate(cr * cc * s.dtype.size).order(ByteOrder.LITTLE_ENDIAN)
            var i = 0
            while (i < cr) {
              var j = 0
              while (j < cc) {
                val v = if (r0 + i < s.rows && c0 + j < s.cols) s.data(r0 + i)(c0 + j) else 0.0
                s.dtype match {
                  case F32 => plain.putFloat(v.toFloat)
                  case F64 => plain.putDouble(v)
                  case _ => plain.putInt(v.toInt)
                }
                j += 1
              }
              i += 1
            }
            var bytes = plain.array()
            if (s.shuffle) bytes = shuffleBytes(bytes, s.dtype.size)
            if (s.deflate) bytes = deflateBytes(bytes)
            (Array(r0.toLong, c0.toLong, 0L), bytes)
          }
          val keyLen = 8 + 3 * 8 // size+mask, offsets (rank 2 + elem dim)
          val btAddr = cursor
          cursor += 24L + (blobs.length + 1) * keyLen + blobs.length * 8
          val withAddrs = blobs.map { b => val a = cursor; cursor += b._2.length; (b, a) }
          Plan(s, hdrAddr, msgs, Undef,
            withAddrs.map { case ((offs, bytes), a) => (offs :+ a, bytes) }, btAddr, cursor)
      }
    }
    val eof = cursor
    // single-allocation writer: a named bound, not an Int overflow crash
    // after an expensive collect (benchmark-scale files by design)
    require(eof <= Int.MaxValue - 8,
      s"HDF5 writer supports files up to 2 GB; this write needs $eof bytes")

    // ---- emit ------------------------------------------------------------
    val out = ByteBuffer.allocate(eof.toInt).order(ByteOrder.LITTLE_ENDIAN)
    // superblock v0
    out.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
    out.put(0.toByte); out.put(8.toByte); out.put(8.toByte); out.put(0.toByte)
    out.putShort(4); out.putShort(16) // group leaf / internal k
    out.putInt(0) // consistency flags
    out.putLong(0L); out.putLong(Undef); out.putLong(eof); out.putLong(Undef)
    // root symbol table entry: cached btree + heap in scratch
    out.putLong(0L); out.putLong(rootHdrAddr); out.putInt(1); out.putInt(0)
    out.putLong(btreeAddr); out.putLong(heapAddr)
    require(out.position() == rootHdrAddr, s"superblock size drift: ${out.position()}")
    // root object header: one symbol table message
    out.put(1.toByte); out.put(0.toByte); out.putShort(1)
    out.putInt(1); out.putInt(8 + 16); out.putInt(0)
    out.putShort(0x0011); out.putShort(16); out.putInt(0)
    out.putLong(btreeAddr); out.putLong(heapAddr)
    // local heap
    require(out.position() == heapAddr, "heap address drift")
    out.put('H'.toByte); out.put('E'.toByte); out.put('A'.toByte); out.put('P'.toByte)
    out.putInt(0) // version + reserved
    out.putLong(heapSegSize); out.putLong(Undef); out.putLong(heapDataAddr)
    out.putLong(0L) // reserved first 8 bytes of the data segment
    heapNames.foreach { n =>
      out.put(n.getBytes("UTF-8")); out.put(0.toByte)
      (0 until (pad8(n.length + 1) - (n.length + 1))).foreach(_ => out.put(0.toByte))
    }
    // group B-tree: one leaf pointing at the SNOD
    require(out.position() == btreeAddr, "btree address drift")
    out.put('T'.toByte); out.put('R'.toByte); out.put('E'.toByte); out.put('E'.toByte)
    out.put(0.toByte); out.put(0.toByte); out.putShort(1)
    out.putLong(Undef); out.putLong(Undef)
    out.putLong(0L); out.putLong(snodAddr); out.putLong(nameOffs.last)
    // SNOD
    require(out.position() == snodAddr, "snod address drift")
    out.put('S'.toByte); out.put('N'.toByte); out.put('O'.toByte); out.put('D'.toByte)
    out.put(1.toByte); out.put(0.toByte); out.putShort(specs.length.toShort)
    specs.zip(nameOffs).zip(plans).foreach { case ((s, no), p) =>
      val _ = s
      out.putLong(no); out.putLong(p.hdrAddr); out.putInt(0); out.putInt(0)
      out.putLong(0L); out.putLong(0L)
    }
    // datasets
    plans.foreach { p =>
      val s = p.spec
      require(out.position() == p.hdrAddr, s"${s.name}: header address drift")
      val hasFilters = s.shuffle || s.deflate
      val nmsgs = if (hasFilters) 4 else 3
      out.put(1.toByte); out.put(0.toByte); out.putShort(nmsgs.toShort)
      out.putInt(1); out.putInt(p.hdrMsgsSize); out.putInt(0)
      // dataspace v1, rank 2
      out.putShort(0x0001); out.putShort(24); out.putInt(0)
      out.put(1.toByte); out.put(2.toByte); out.put(0.toByte)
      (0 until 5).foreach(_ => out.put(0.toByte))
      out.putLong(s.rows.toLong); out.putLong(s.cols.toLong)
      // datatype
      s.dtype match {
        case F32 =>
          out.putShort(0x0003); out.putShort(24); out.putInt(0)
          out.put(0x11.toByte) // version 1, class 1 (float)
          out.put(0x20.toByte); out.put(31.toByte); out.put(0.toByte)
          out.putInt(4)
          out.putShort(0); out.putShort(32)
          out.put(23.toByte); out.put(8.toByte); out.put(0.toByte); out.put(23.toByte)
          out.putInt(127); out.putInt(0) // pad to the declared 24
        case F64 =>
          out.putShort(0x0003); out.putShort(24); out.putInt(0)
          out.put(0x11.toByte)
          out.put(0x20.toByte); out.put(63.toByte); out.put(0.toByte)
          out.putInt(8)
          out.putShort(0); out.putShort(64)
          out.put(52.toByte); out.put(11.toByte); out.put(0.toByte); out.put(52.toByte)
          out.putInt(1023); out.putInt(0) // pad to the declared 24
        case _ =>
          out.putShort(0x0003); out.putShort(16); out.putInt(0)
          out.put(0x10.toByte) // version 1, class 0 (fixed-point)
          out.put(0x08.toByte); out.put(0.toByte); out.put(0.toByte) // signed, LE
          out.putInt(4)
          out.putShort(0); out.putShort(32)
          out.putInt(0) // pad to 8
      }
      // filter pipeline v1 (pipeline order: shuffle, deflate)
      if (hasFilters) {
        val n = (if (s.shuffle) 1 else 0) + (if (s.deflate) 1 else 0)
        out.putShort(0x000B); out.putShort((8 + 16 * n).toShort); out.putInt(0)
        out.put(1.toByte); out.put(n.toByte)
        (0 until 6).foreach(_ => out.put(0.toByte))
        if (s.shuffle) { // id 2, one client value: element size
          out.putShort(2); out.putShort(0); out.putShort(1); out.putShort(1)
          out.putInt(s.dtype.size); out.putInt(0)
        }
        if (s.deflate) { // id 1, one client value: level
          out.putShort(1); out.putShort(0); out.putShort(1); out.putShort(1)
          out.putInt(6); out.putInt(0)
        }
      }
      // layout v3
      s.chunk match {
        case None =>
          out.putShort(0x0008); out.putShort(24); out.putInt(0)
          out.put(3.toByte); out.put(1.toByte)
          out.putLong(p.dataAddr); out.putLong(s.rows.toLong * s.cols * s.dtype.size)
          (0 until 6).foreach(_ => out.put(0.toByte))
        case Some((cr, cc)) =>
          out.putShort(0x0008); out.putShort(24); out.putInt(0)
          out.put(3.toByte); out.put(2.toByte); out.put(3.toByte) // ndims = rank + 1
          out.putLong(p.btAddr)
          out.putInt(cr); out.putInt(cc); out.putInt(s.dtype.size)
          out.put(0.toByte) // pad to 8
      }
      // data
      s.chunk match {
        case None =>
          require(out.position() == p.dataAddr, s"${s.name}: data address drift")
          s.data.foreach(_.foreach { v =>
            s.dtype match {
              case F32 => out.putFloat(v.toFloat)
              case F64 => out.putDouble(v)
              case _ => out.putInt(v.toInt)
            }
          })
        case Some(_) =>
          require(out.position() == p.btAddr, s"${s.name}: chunk btree address drift")
          out.put('T'.toByte); out.put('R'.toByte); out.put('E'.toByte); out.put('E'.toByte)
          out.put(1.toByte); out.put(0.toByte); out.putShort(p.chunks.length.toShort)
          out.putLong(Undef); out.putLong(Undef)
          p.chunks.foreach { case (offsAndAddr, bytes) =>
            out.putInt(bytes.length); out.putInt(0)
            out.putLong(offsAndAddr(0)); out.putLong(offsAndAddr(1)); out.putLong(offsAndAddr(2))
            out.putLong(offsAndAddr(3)) // child = chunk data address
          }
          // final key: one past the last chunk in the slowest dim
          out.putInt(0); out.putInt(0)
          out.putLong(s.rows.toLong); out.putLong(s.cols.toLong); out.putLong(0L)
          p.chunks.foreach { case (offsAndAddr, bytes) =>
            require(out.position() == offsAndAddr(3), s"${s.name}: chunk address drift")
            out.put(bytes)
          }
      }
    }
    require(out.position() == eof, s"eof drift: ${out.position()} vs $eof")
    Files.write(Paths.get(path), out.array())
  }

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  private def shuffleBytes(in: Array[Byte], es: Int): Array[Byte] = {
    val n = in.length / es
    val out = new Array[Byte](in.length)
    var p = 0
    while (p < es) {
      var i = 0
      while (i < n) { out(p * n + i) = in(i * es + p); i += 1 }
      p += 1
    }
    out
  }

  private def deflateBytes(in: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(in); d.finish()
    val buf = new Array[Byte](in.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) {
      val k = d.deflate(buf)
      bos.write(buf, 0, k)
    }
    d.end()
    bos.toByteArray
  }
}
