package graft.wire

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.nio.charset.StandardCharsets.UTF_8

/** A real TCP listener in front of [[WireService]] — the last reference
  * surface that had been adjudicated n/a (reference httpapi/httpapi.go:42–52
  * `ListenAndServe`; setup.go mounts the middleware chain under one mux).
  * Zero new dependencies: the JDK's built-in `com.sun.net.httpserver`
  * adapts the socket onto `WireService.handle` — method/path/headers/body
  * map one-to-one, the peer IP plays Go's `http.Request.RemoteAddr` for
  * the whitelist middleware, and the response codec follows the request
  * `Content-Type` exactly like the in-process face (JSON or msgpack).
  *
  * Scale shape: the listener is a DRIVER-side serving front — each
  * request plans on the shared SparkSession and executes on the cluster,
  * so listener concurrency (a small fixed pool; Spark's scheduler does
  * the real fan-out) is about accepting sockets, not about compute.
  * `GET /metrics` is served here, outside the tenant middleware, because
  * a Prometheus scraper carries no tenant headers — the reference
  * likewise exposes metrics on a separate mux (cluster/metrics.go).
  */
final class HttpListener(
    service: WireService, host: String = "127.0.0.1", port: Int = 0,
    threads: Int = 8,
    /** Request-body cap in bytes, enforced before the body is buffered
      * (the security middlewares run after the read, so without it an
      * unauthenticated peer could fill driver memory). 32 MB clears the
      * largest legal insert batch by a wide margin.
      */
    maxBodyBytes: Int = 32 << 20) {

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
  private val server =
    HttpServer.create(new java.net.InetSocketAddress(host, port), 64)
  server.setExecutor(pool)
  server.createContext("/", new HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try respond(ex)
      catch {
        // last-resort recover: WireService already wraps handler panics,
        // so this guards only the adapter itself (bad socket, torn read)
        case scala.util.control.NonFatal(e) =>
          try {
            // render through the JSON library so any message content
            // (backslashes, newlines, quotes) stays valid JSON
            val out = org.json4s.jackson.JsonMethods.compact(
              org.json4s.jackson.JsonMethods.render(org.json4s.JObject(
                "error" -> org.json4s.JString(
                  s"listener error: ${String.valueOf(e.getMessage)}"))))
              .getBytes(UTF_8)
            ex.getResponseHeaders.set("Content-Type", "application/json")
            ex.sendResponseHeaders(500, out.length.toLong)
            ex.getResponseBody.write(out)
          } catch { case scala.util.control.NonFatal(_) => () }
      } finally ex.close()
  })
  server.start()

  private def respond(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    // the service reads exactly these; Headers.getFirst is case-insensitive
    val headers = Seq("X-Proxy-Secret", "X-User-Id", "X-Plan-Id", "Content-Type")
      .flatMap(n => Option(ex.getRequestHeaders.getFirst(n)).map(n -> _)).toMap
    val remote = ex.getRemoteAddress.getAddress.getHostAddress
    if (ex.getRequestMethod.equalsIgnoreCase("GET") && path == "/metrics") {
      // skips only the TENANT wall (a scraper has no tenant headers); the
      // SECURITY middlewares — proxy secret, IP whitelist against the
      // socket's peer — still gate the exposition (WireService.handleMetrics)
      val (status, text) = service.handleMetrics(headers, remote)
      val body = text.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type",
        if (status == 200) "text/plain; version=0.0.4" else "application/json")
      ex.sendResponseHeaders(status, if (body.isEmpty) -1L else body.length.toLong)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      return
    }
    // Bound the body BEFORE buffering it: the tenant/security middlewares
    // run inside service.handle, i.e. after the read — without a cap an
    // unauthenticated peer could stream a multi-GB POST into driver
    // memory ahead of its 407. Declared length past the cap 413s without
    // reading; a chunked/lying stream is cut off at the cap + 1 mark.
    val declared = Option(ex.getRequestHeaders.getFirst("Content-Length"))
      .flatMap(_.toLongOption).getOrElse(-1L)
    if (declared > maxBodyBytes) { reject413(ex, declared); return }
    val body = ex.getRequestBody.readNBytes(maxBodyBytes + 1)
    if (body.length > maxBodyBytes) { reject413(ex, body.length.toLong); return }
    val resp = service.handle(ex.getRequestMethod, path, headers, body, remote)
    val msgpack = headers.get("Content-Type").contains("application/msgpack")
    val out = if (msgpack) resp.msgpack else resp.json.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      if (msgpack) "application/msgpack" else "application/json")
    ex.sendResponseHeaders(resp.status, if (out.isEmpty) -1L else out.length.toLong)
    if (out.nonEmpty) ex.getResponseBody.write(out)
  }

  private def reject413(ex: HttpExchange, got: Long): Unit = {
    val out = (s"""{"error":"request body too large""" +
      s""" (${got} B > $maxBodyBytes B)"}""").getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(413, out.length.toLong)
    ex.getResponseBody.write(out)
  }

  /** The bound port (useful with port=0: the OS picks a free one). */
  def boundPort: Int = server.getAddress.getPort

  /** Graceful shutdown: stop accepting, drain in-flight exchanges up to
    * `drainSeconds`, then release the worker pool.
    */
  def close(drainSeconds: Int = 2): Unit = {
    server.stop(drainSeconds)
    pool.shutdown()
    if (!pool.awaitTermination(drainSeconds.toLong + 1, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdownNow()
  }
}
