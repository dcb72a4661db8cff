package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.model.{Json, MsgPack}

/** msgpack wire format: decode targets the same AST as JSON, so a request
  * encoded either way must parse identically (reference accepts both on
  * every endpoint, httpapi/v2/handlers.go:97–100).
  */
class MsgPackSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val requestJson =
    """{"query": {"property": "p_size",
      |           "_and": [{"property": "p_size", "integer": {"value": 5, "operator": "greaterThanOrEquals"}},
      |                    {"property": "p_name", "string": {"value": "a", "operator": "startsWith"}}]},
      | "select": ["p_name", "p_size"],
      | "sort": [{"property": "p_size", "descending": true}],
      | "offset": 2, "limit": 7}""".stripMargin

  test("SearchRequest round-trips JSON AST → msgpack → same parsed request") {
    val ast = JsonMethods.parse(requestJson)
    val viaJson = Json.parseSearchRequest(requestJson)
    val viaMsgPack = Json.parseSearchRequestMsgPack(MsgPack.encode(ast))
    assert(viaJson == viaMsgPack)
    assert(viaMsgPack.limit == 7 && viaMsgPack.offset == 2)
    assert(viaMsgPack.query.and.length == 2)
  }

  test("all wire-relevant format families decode (hand-built bytes)") {
    // fixstr + str8, fixint families, uint/int widths, float32/64, nil/bool
    def hex(s: String): Array[Byte] =
      s.split(" ").map(x => Integer.parseInt(x, 16).toByte)
    assert(MsgPack.decode(hex("c0")) == JNull)
    assert(MsgPack.decode(hex("c3")) == JBool(true))
    assert(MsgPack.decode(hex("7f")) == JLong(127))
    assert(MsgPack.decode(hex("e0")) == JLong(-32))
    assert(MsgPack.decode(hex("cc ff")) == JLong(255))
    assert(MsgPack.decode(hex("cd 01 00")) == JLong(256))
    assert(MsgPack.decode(hex("ce 00 01 00 00")) == JLong(65536))
    assert(MsgPack.decode(hex("d0 80")) == JLong(-128))
    assert(MsgPack.decode(hex("d1 ff 00")) == JLong(-256))
    assert(MsgPack.decode(hex("ca 3f 80 00 00")) == JDouble(1.0))
    assert(MsgPack.decode(hex("cb 40 09 21 fb 54 44 2d 18")) == JDouble(3.141592653589793))
    assert(MsgPack.decode(hex("a2 68 69")) == JString("hi"))
    assert(MsgPack.decode(hex("92 01 02")) == JArray(List(JLong(1), JLong(2))))
    assert(MsgPack.decode(hex("81 a1 6b 2a")) == JObject(List("k" -> JLong(42))))
    // ext types are rejected, trailing bytes are rejected
    intercept[IllegalArgumentException](MsgPack.decode(hex("d4 01 00")))
    intercept[IllegalArgumentException](MsgPack.decode(hex("c0 c0")))
  }

  test("truncated 8/16-bit lengths fail with the codec's error, not BufferUnderflow") {
    def hex(s: String): Array[Byte] =
      s.split(" ").map(java.lang.Integer.parseInt(_, 16).toByte)
    // str8 claiming 16 bytes with 2 present; str16; bin8; array16; map16;
    // fixstr/fixarray claiming more than remains — every one must surface
    // as IllegalArgumentException (the codec's contract), never a raw
    // BufferUnderflowException from the allocation/read
    val cases = Seq(
      "d9 10 68 69",       // str8 len 16, 2 bytes remain
      "da 00 40 68 69",    // str16 len 64, 2 bytes remain
      "c4 08 01",          // bin8 len 8, 1 byte remains
      "c5 00 20 01",       // bin16 len 32, 1 byte remains
      "dc 00 09 01 02",    // array16 count 9, 2 bytes remain
      "de 00 05 a1 6b 2a", // map16 count 5, one pair remains
      "a5 68 69",          // fixstr len 5, 2 bytes remain
      "93 01 02")          // fixarray count 3, 2 elements remain
    cases.foreach { c =>
      intercept[IllegalArgumentException](MsgPack.decode(hex(c)))
    }
  }

  test("hostile payloads fail with the codec's error: depth bomb, bad UTF-8, overflow") {
    // 60k nested fixarray-of-1 headers pass every length check (1 element,
    // ≥1 byte remains each level) — must hit the depth cap, not the stack
    val bomb = Array.fill[Byte](60000)(0x91.toByte) :+ 0xc0.toByte
    val e1 = intercept[IllegalArgumentException](MsgPack.decode(bomb))
    assert(e1.getMessage.contains("nesting"))
    // invalid UTF-8 in a fixstr: reject like the JSON wire does, never
    // U+FFFD-substitute into property names
    val bad = Array(0xa2, 0xff, 0xfe).map(_.toByte)
    val e2 = intercept[IllegalArgumentException](MsgPack.decode(bad))
    assert(e2.getMessage.contains("UTF-8"))
    // 2^63 as JInt: encode must reject, not wrap to Long.MinValue
    val e3 = intercept[IllegalArgumentException](
      MsgPack.encode(JObject(List("x" -> JInt(BigInt("9223372036854775808"))))))
    assert(e3.getMessage.contains("range"))
  }

  test("vectors of doubles survive the float64 path") {
    val ast = JObject(List("vector" -> JArray(List(JDouble(0.25), JDouble(-1.5)))))
    val back = MsgPack.decode(MsgPack.encode(ast))
    assert(back == ast)
  }

  test("large payloads round-trip: str32 and array lengths past 16 bits") {
    val big = "x" * 70000 // str32 territory
    val ast = JObject(List(
      "text" -> JString(big),
      "ids" -> JArray((0 until 70000).map(i => JLong(i.toLong)).toList)))
    val back = MsgPack.decode(MsgPack.encode(ast))
    assert(back == ast)
  }
}
