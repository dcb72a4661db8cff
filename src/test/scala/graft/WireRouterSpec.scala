package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.wire.WireRouter

/** The reference's wire surface as in-process round-trips (reference
  * httpapi/v2/handlers.go + httpapi_test shapes): route dispatch, envelope
  * validation bounds, status codes, JSON and msgpack codecs, and the full
  * create → insert → search → update → delete → drop lifecycle.
  */
class WireRouterSpec extends SparkSuite {

  private def freshRouter(): WireRouter = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wire_").toString
    new WireRouter(graft.Graft(spark, dir))
  }

  private def json(s: String): Array[Byte] = s.getBytes("UTF-8")
  private def parse(r: WireRouter.WireResponse): JValue = r.body

  private val schemaJson =
    """{"id": "mycol", "indexSchema": {
      |  "vec": {"type": "vectorFlat", "vectorFlat": {"vectorSize": 2, "distanceMetric": "euclidean"}},
      |  "name": {"type": "string", "string": {"caseSensitive": false}},
      |  "size": {"type": "integer"}}}""".stripMargin

  test("ping, list, create, get, duplicate-create: routes + envelopes + status codes") {
    val r = freshRouter()
    assert(r.handle("GET", "/ping").status == 200)
    assert(parse(r.handle("GET", "/collections")) \ "collections" == JArray(Nil))

    // validation first: short id, non-alphanum id, bad schema type
    assert(r.handle("POST", "/collections", json("""{"id":"ab","indexSchema":{}}""")).status == 400)
    assert(r.handle("POST", "/collections", json("""{"id":"Bad-Id9","indexSchema":{}}""")).status == 400)
    assert(r.handle("POST", "/collections",
      json("""{"id":"okid1","indexSchema":{"x":{"type":"wat"}}}""")).status == 400)

    assert(r.handle("POST", "/collections", json(schemaJson)).status == 200)
    assert(r.handle("POST", "/collections", json(schemaJson)).status == 409)
    val listed = parse(r.handle("GET", "/collections")) \ "collections"
    assert(listed == JArray(List(JObject("id" -> JString("mycol")))))

    val got = parse(r.handle("GET", "/collections/mycol"))
    assert(got \ "id" == JString("mycol"))
    // the index schema round-trips through the reference wire format
    assert(got \ "indexSchema" \ "vec" \ "type" == JString("vectorFlat"))
    assert(got \ "indexSchema" \ "vec" \ "vectorFlat" \ "distanceMetric" == JString("euclidean"))
    assert(got \ "shards" == JArray(List(JObject(
      "id" -> JString("0"), "pointCount" -> JInt(0)))))

    assert(r.handle("GET", "/collections/absent1").status == 404)
    assert(r.handle("GET", "/collections/ab").status == 400)
    assert(r.handle("PATCH", "/collections/mycol").status == 404)
  }

  test("insert + search (JSON and msgpack) + update field-merge + delete points + drop") {
    val r = freshRouter()
    assert(r.handle("POST", "/collections", json(schemaJson)).status == 200)

    // insert validation: missing _id (this engine mints no ids),
    // undeclared field, empty batch
    assert(r.handle("POST", "/collections/mycol/points",
      json("""{"points":[{"name":"x"}]}""")).status == 400)
    assert(r.handle("POST", "/collections/mycol/points",
      json("""{"points":[{"_id":"a","wat":1}]}""")).status == 400)
    assert(r.handle("POST", "/collections/mycol/points",
      json("""{"points":[]}""")).status == 400)

    val ins = r.handle("POST", "/collections/mycol/points", json(
      """{"points":[
        |  {"_id":"p1","vec":[0.0,0.0],"name":"origin","size":1},
        |  {"_id":"p2","vec":[1.0,0.0],"name":"east","size":2},
        |  {"_id":"p3","vec":[0.0,3.0],"name":"north","size":3}]}""".stripMargin))
    assert(ins.status == 200, ins.json)
    assert(parse(ins) \ "message" == JString("success"))
    assert(parse(r.handle("GET", "/collections/mycol")) \ "shards" \\ "pointCount" == JInt(3))

    // search: vector near through the JSON wire
    val searchBody =
      """{"query":{"property":"vec","vectorFlat":{
        |"vector":[0.0,0.0],"operator":"near","limit":2}},
        |"select":["name"],"limit":2}""".stripMargin
    val found = parse(r.handle("POST", "/collections/mycol/points/search", json(searchBody)))
    val pts = (found \ "points").asInstanceOf[JArray].arr
    assert(pts.map(p => p \ "_id") == List(JString("p1"), JString("p2")), found)
    assert(pts.head \ "name" == JString("origin"))
    assert(pts.head \ "_distance" == JDouble(0.0))
    assert(pts.forall(p => p \ "_hybridScore" != JNothing))

    // the SAME search through the msgpack codec byte-for-byte round-trip
    val mp = graft.model.MsgPack.encode(JsonMethods.parse(searchBody))
    val foundMp = r.handle("POST", "/collections/mycol/points/search", mp,
      contentType = "application/msgpack")
    assert(foundMp.status == 200)
    assert(graft.model.MsgPack.decode(foundMp.msgpack) == found)

    // update: field-merge (only `name` changes; vec/size survive), mixed
    // field sets in one batch
    val upd = r.handle("PUT", "/collections/mycol/points", json(
      """{"points":[
        |  {"_id":"p2","name":"EAST"},
        |  {"_id":"p3","size":33,"name":"North"}]}""".stripMargin))
    assert(upd.status == 200, upd.json)
    val after = parse(r.handle("POST", "/collections/mycol/points/search", json(
      """{"query":{"property":"size","integer":{"value":0,"operator":"greaterThan"}},
        |"select":["name","size","vec"],"limit":10,
        |"sort":[{"property":"size"}]}""".stripMargin)))
    val rows = (after \ "points").asInstanceOf[JArray].arr
    assert(rows.map(p => p \ "name") ==
      List(JString("origin"), JString("EAST"), JString("North")), after)
    assert(rows.map(p => p \ "size") == List(JInt(1), JInt(2), JInt(33)))
    assert(rows(1) \ "vec" == JArray(List(JDouble(1.0), JDouble(0.0))))

    // delete points, then the collection
    assert(r.handle("DELETE", "/collections/mycol/points",
      json("""{"ids":["p1","p3"]}""")).status == 200)
    assert(parse(r.handle("GET", "/collections/mycol")) \ "shards" \\ "pointCount" == JInt(1))
    assert(r.handle("DELETE", "/collections/mycol/points",
      json("""{"ids":[]}""")).status == 400)
    assert(r.handle("DELETE", "/collections/mycol").status == 200)
    assert(r.handle("GET", "/collections/mycol").status == 404)
    assert(parse(r.handle("GET", "/collections")) \ "collections" == JArray(Nil))
  }

  test("batch caps mirror the reference bounds (insert 10000, update/delete 100)") {
    val r = freshRouter()
    assert(r.handle("POST", "/collections", json(
      """{"id":"caps1","indexSchema":{"size":{"type":"integer"}}}""")).status == 200)
    val over = (0 to 100).map(i => s"""{"_id":"u$i","size":$i}""").mkString(",")
    assert(r.handle("PUT", "/collections/caps1/points",
      json(s"""{"points":[$over]}""")).status == 400)
    val overIds = (0 to 100).map(i => s""""u$i"""").mkString(",")
    assert(r.handle("DELETE", "/collections/caps1/points",
      json(s"""{"ids":[$overIds]}""")).status == 400)
    // malformed body → 400, not an exception
    assert(r.handle("POST", "/collections/caps1/points", json("{nope")).status == 400)
  }

  test("WireService: app-header middleware + tenant isolation through the wire") {
    val root = java.nio.file.Files.createTempDirectory("graft_wiresvc_").toString
    val svc = new graft.wire.WireService(spark, root,
      userPlans = Map("basic" -> graft.store.UserPlan()))
    // header validation mirrors the reference middleware
    assert(svc.handle("GET", "/collections", Map.empty).status == 400)
    assert(svc.handle("GET", "/collections",
      Map("X-User-Id" -> "alice", "X-Plan-Id" -> "wat")).status == 403)
    val alice = Map("X-User-Id" -> "alice", "X-Plan-Id" -> "basic")
    val bob = Map("X-User-Id" -> "bob", "X-Plan-Id" -> "basic")
    val mk = """{"id":"shared1","indexSchema":{"size":{"type":"integer"}}}"""
    // SAME collection name for two tenants - namespaced, no interference
    assert(svc.handle("POST", "/collections", alice, json(mk)).status == 200)
    assert(svc.handle("POST", "/collections", bob, json(mk)).status == 200)
    assert(svc.handle("POST", "/collections/shared1/points", alice,
      json("""{"points":[{"_id":"a1","size":1}]}""")).status == 200)
    val aliceGot = parse(svc.handle("GET", "/collections/shared1", alice))
    val bobGot = parse(svc.handle("GET", "/collections/shared1", bob))
    assert(aliceGot \\ "pointCount" == JInt(1))
    assert(bobGot \\ "pointCount" == JInt(0))
    // a hostile user id cannot escape the namespace
    assert(svc.handle("GET", "/collections",
      Map("X-User-Id" -> "../alice", "X-Plan-Id" -> "basic")).status == 400)
  }

  test("PUT is validate-then-commit: a bad point aborts the whole batch; dup ids apply in request order") {
    val r = freshRouter()
    assert(r.handle("POST", "/collections", json(schemaJson)).status == 200)
    assert(r.handle("POST", "/collections/mycol/points", json(
      """{"points":[{"_id":"p1","vec":[0.0,0.0],"name":"before","size":1}]}""")).status == 200)
    // second point is malformed (string in a float vector): the first
    // point's update must NOT land
    val bad = r.handle("PUT", "/collections/mycol/points", json(
      """{"points":[{"_id":"p1","name":"after"},{"_id":"p1","vec":["wat"]}]}"""))
    assert(bad.status == 400, bad.json)
    val check = parse(r.handle("POST", "/collections/mycol/points/search", json(
      """{"query":{"property":"size","integer":{"value":0,"operator":"greaterThan"}},
        |"select":["name"],"limit":10}""".stripMargin)))
    assert((check \\ "name") == JString("before"), check)
    // duplicate ids with DIFFERENT field sets: last-in-request wins
    assert(r.handle("PUT", "/collections/mycol/points", json(
      """{"points":[{"_id":"p1","name":"first"},{"_id":"p1","name":"second","size":9}]}""")).status == 200)
    val after = parse(r.handle("POST", "/collections/mycol/points/search", json(
      """{"query":{"property":"size","integer":{"value":0,"operator":"greaterThan"}},
        |"select":["name","size"],"limit":10}""".stripMargin)))
    assert((after \\ "name") == JString("second"), after)
    assert((after \\ "size") == JInt(9), after)
  }
}
