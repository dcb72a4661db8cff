package graft.model

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.json4s._

/** Minimal MessagePack codec (public spec, msgpack.org) for wire bodies —
  * the reference accepts JSON and msgpack on every endpoint
  * (httpapi/v2/handlers.go:97–100) and stores point payloads as msgpack
  * (models/point.go:39–42). No msgpack library ships with Spark, so this
  * is a dependency-free implementation of the value subset a request body
  * can contain: nil/bool/int/float/str/bin/array/map (ext types are
  * rejected). Decoding targets the same json4s AST the JSON path uses, so
  * both wire formats share one request parser.
  */
object MsgPack {

  /** Nesting cap: jackson bounds the JSON path at ~1000 levels; without a
    * matching cap a hostile body of repeated fixarray-of-1 headers passes
    * every length check (each level claims 1 element with ≥1 byte left)
    * and recurses once per byte — a StackOverflowError that ESCAPES the
    * codec's IllegalArgumentException contract.
    */
  private val MaxDepth = 128

  def decode(bytes: Array[Byte]): JValue = {
    val buf = ByteBuffer.wrap(bytes)
    // payload lengths are bounds-checked up front (checkedLen), but a
    // buffer truncated at a tag or fixed-width-number boundary still
    // underflows — translate it so every malformed payload fails with
    // this codec's IllegalArgumentException contract
    val v =
      try read(buf, 0)
      catch { case _: java.nio.BufferUnderflowException =>
        throw new IllegalArgumentException("truncated msgpack payload")
      }
    require(!buf.hasRemaining, s"${buf.remaining()} trailing byte(s) after msgpack value")
    v
  }

  private def read(b: ByteBuffer, depth: Int): JValue = {
    require(depth <= MaxDepth, s"msgpack nesting exceeds $MaxDepth levels")
    val tag = b.get() & 0xff
    tag match {
      case t if t <= 0x7f => JLong(t.toLong)                       // positive fixint
      case t if t >= 0xe0 => JLong((t - 256).toLong)               // negative fixint
      case t if (t & 0xf0) == 0x80 => readMap(b, checkedLen(b, t & 0x0f), depth)   // fixmap
      case t if (t & 0xf0) == 0x90 => readArray(b, checkedLen(b, t & 0x0f), depth) // fixarray
      case t if (t & 0xe0) == 0xa0 => JString(readStr(b, checkedLen(b, t & 0x1f))) // fixstr
      case 0xc0 => JNull
      case 0xc2 => JBool(false)
      case 0xc3 => JBool(true)
      case 0xc4 => bin(b, checkedLen(b, b.get() & 0xff))
      case 0xc5 => bin(b, checkedLen(b, b.getShort() & 0xffff))
      case 0xc6 => bin(b, checkedLen(b, b.getInt()))
      case 0xca => JDouble(b.getFloat().toDouble)
      case 0xcb => JDouble(b.getDouble())
      case 0xcc => JLong((b.get() & 0xff).toLong)
      case 0xcd => JLong((b.getShort() & 0xffff).toLong)
      case 0xce => JLong(b.getInt() & 0xffffffffL)
      case 0xcf =>
        val v = b.getLong()
        require(v >= 0, "uint64 above Long.MaxValue unsupported")
        JLong(v)
      case 0xd0 => JLong(b.get().toLong)
      case 0xd1 => JLong(b.getShort().toLong)
      case 0xd2 => JLong(b.getInt().toLong)
      case 0xd3 => JLong(b.getLong())
      case 0xd9 => JString(readStr(b, checkedLen(b, b.get() & 0xff)))
      case 0xda => JString(readStr(b, checkedLen(b, b.getShort() & 0xffff)))
      case 0xdb => JString(readStr(b, checkedLen(b, b.getInt())))
      case 0xdc => readArray(b, checkedLen(b, b.getShort() & 0xffff), depth)
      case 0xdd => readArray(b, checkedLen(b, b.getInt()), depth)
      case 0xde => readMap(b, checkedLen(b, b.getShort() & 0xffff), depth)
      case 0xdf => readMap(b, checkedLen(b, b.getInt()), depth)
      case other => throw new IllegalArgumentException(
        f"unsupported msgpack tag 0x$other%02x (ext types not accepted)")
    }
  }

  /** Every length/element count is bounded by the bytes actually
    * remaining before any allocation or read. 32-bit lengths arrive as
    * SIGNED ints: a hostile payload can carry a negative count
    * (List.fill silently yields Nil and the parser desyncs) or a 2 GB
    * allocation request; 8/16-bit lengths (≤ 65535) can still exceed a
    * truncated buffer and would otherwise surface as a raw
    * BufferUnderflowException instead of this codec's
    * IllegalArgumentException contract. For array/map tags the count is
    * elements, not bytes — each element occupies ≥ 1 byte, so the bound
    * still holds.
    */
  private def checkedLen(b: ByteBuffer, n: Int): Int = {
    require(n >= 0 && n <= b.remaining(),
      s"msgpack length $n out of bounds (${b.remaining()} bytes remain)")
    n
  }

  /** REJECT invalid UTF-8 instead of the replacement-character default:
    * the JSON wire errors on malformed input via jackson, and the two
    * formats must share one accept/reject behavior — U+FFFD would flow
    * corrupted bytes into property names and stored values silently.
    */
  private def readStr(b: ByteBuffer, n: Int): String = {
    val a = new Array[Byte](n); b.get(a)
    try StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      .decode(ByteBuffer.wrap(a)).toString
    catch { case _: java.nio.charset.CharacterCodingException =>
      throw new IllegalArgumentException("invalid UTF-8 in msgpack string")
    }
  }

  /** Binary payloads surface as base64 strings (JSON-side parity). */
  private def bin(b: ByteBuffer, n: Int): JValue = {
    val a = new Array[Byte](n); b.get(a)
    JString(java.util.Base64.getEncoder.encodeToString(a))
  }

  private def readArray(b: ByteBuffer, n: Int, depth: Int): JValue =
    JArray(List.fill(n)(read(b, depth + 1)))

  private def readMap(b: ByteBuffer, n: Int, depth: Int): JValue =
    JObject(List.fill(n) {
      read(b, depth + 1) match {
        case JString(k) => k -> read(b, depth + 1)
        case other => throw new IllegalArgumentException(s"non-string map key: $other")
      }
    })

  def encode(v: JValue): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(out, v)
    out.toByteArray
  }

  private def write(o: ByteArrayOutputStream, v: JValue): Unit = v match {
    case JNull | JNothing => o.write(0xc0)
    case JBool(x) => o.write(if (x) 0xc3 else 0xc2)
    case JInt(x) =>
      // BigInt.toLong keeps the low 64 bits — 2^63 would silently encode
      // as Long.MinValue (the decoder rejects out-of-range uint64 too)
      require(x.isValidLong, s"integer out of msgpack long range: $x")
      writeLong(o, x.toLong)
    case JLong(x) => writeLong(o, x)
    case JDouble(x) => o.write(0xcb); writeBytes(o, ByteBuffer.allocate(8).putDouble(x).array())
    case JDecimal(x) =>
      val d = x.toDouble
      // a decimal past double range would silently encode ±Infinity —
      // fail fast like the JInt uint64 guard (precision rounding within
      // range is inherent to the float64 wire format)
      require(!d.isInfinity, s"decimal out of msgpack float64 range: $x")
      o.write(0xcb); writeBytes(o, ByteBuffer.allocate(8).putDouble(d).array())
    case JString(s) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length < 32) o.write(0xa0 | b.length)
      else if (b.length < 256) { o.write(0xd9); o.write(b.length) }
      else if (b.length < 65536) { o.write(0xda); writeU16(o, b.length) }
      else { o.write(0xdb); writeU32(o, b.length) }
      writeBytes(o, b)
    case JArray(xs) =>
      if (xs.length < 16) o.write(0x90 | xs.length)
      else if (xs.length < 65536) { o.write(0xdc); writeU16(o, xs.length) }
      else { o.write(0xdd); writeU32(o, xs.length) }
      xs.foreach(write(o, _))
    case JObject(fs) =>
      if (fs.length < 16) o.write(0x80 | fs.length)
      else if (fs.length < 65536) { o.write(0xde); writeU16(o, fs.length) }
      else { o.write(0xdf); writeU32(o, fs.length) }
      fs.foreach { case (k, fv) => write(o, JString(k)); write(o, fv) }
    case JSet(xs) => write(o, JArray(xs.toList))
  }

  private def writeU16(o: ByteArrayOutputStream, n: Int): Unit = {
    o.write((n >> 8) & 0xff); o.write(n & 0xff)
  }

  private def writeU32(o: ByteArrayOutputStream, n: Int): Unit = {
    o.write((n >> 24) & 0xff); o.write((n >> 16) & 0xff)
    o.write((n >> 8) & 0xff); o.write(n & 0xff)
  }

  private def writeLong(o: ByteArrayOutputStream, x: Long): Unit =
    if (x >= 0 && x <= 0x7f) o.write(x.toInt)
    else if (x < 0 && x >= -32) o.write((x & 0xff).toInt)
    else { o.write(0xd3); writeBytes(o, ByteBuffer.allocate(8).putLong(x).array()) }

  private def writeBytes(o: ByteArrayOutputStream, b: Array[Byte]): Unit =
    o.write(b, 0, b.length)
}
