package graft.wire

import java.util.concurrent.atomic.{DoubleAdder, LongAdder}
import scala.collection.concurrent.TrieMap

/** Dependency-free mirror of the reference's Prometheus observability
  * surface (reference httpapi/middleware/metrics.go:12–47 — the
  * `http_request_count` / `http_request_duration_seconds` /
  * `http_request_size_bytes` vectors labeled (code, method, handler) —
  * and cluster/metrics.go:5–58 — the point insert/update/delete/search
  * counters). The reference registers these with a Prometheus client and
  * serves them from a SEPARATE metrics port; this engine keeps the
  * socketless convention (rounds 4–6 rulings): [[render]] emits the
  * text exposition format (0.0.4) and any JVM HTTP server mounts it at
  * `/metrics` in one line, exactly like `WireRouter.handle`.
  *
  * The reference's RPC vectors (`cluster_node_rpc_*`, cluster/metrics.go)
  * have no analogue here — there is no RPC boundary in-process; the HTTP
  * vectors cover the one entry point. Handler labels canonicalize
  * collection ids the same way the reference's logger middleware does
  * (middleware.go:30–33: `collections/<id>` → `collections/{collectionId}`).
  *
  * Thread-safe (lock-free adders; label rows materialize on first touch)
  * and deterministic to render (rows sort by label key).
  */
final class WireMetrics {

  /** Prometheus DefBuckets — the reference's duration histogram buckets. */
  val DurationBuckets: Array[Double] =
    Array(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

  /** The reference's request-size buckets (metrics.go:43). */
  val SizeBuckets: Array[Double] = Array(0, 1 << 10, 1 << 15, 1 << 20)

  final class Histogram private[WireMetrics] (buckets: Array[Double]) {
    private[WireMetrics] val counts = Array.fill(buckets.length + 1)(new LongAdder)
    private[WireMetrics] val sum = new DoubleAdder
    def observe(v: Double): Unit = {
      var i = 0
      while (i < buckets.length && v > buckets(i)) i += 1
      counts(i).add(1L)
      sum.add(v)
    }
    private[WireMetrics] def render(
        sb: StringBuilder, name: String, labels: String): Unit = {
      var cum = 0L
      for (i <- buckets.indices) {
        cum += counts(i).sum()
        sb.append(name).append("_bucket{").append(labels)
          .append(",le=\"").append(fmt(buckets(i))).append("\"} ")
          .append(cum).append('\n')
      }
      cum += counts(buckets.length).sum()
      sb.append(name).append("_bucket{").append(labels).append(",le=\"+Inf\"} ")
        .append(cum).append('\n')
      sb.append(name).append("_sum{").append(labels).append("} ")
        .append(sum.sum()).append('\n')
      sb.append(name).append("_count{").append(labels).append("} ")
        .append(cum).append('\n')
    }
  }

  private val requestCount = TrieMap.empty[(String, String, String), LongAdder]
  private val requestDuration = TrieMap.empty[(String, String, String), Histogram]
  private val requestSize = TrieMap.empty[(String, String, String), Histogram]

  /** Point-op counters (reference cluster/rpchandlers.go:420–511 —
    * inserted points, updated ids, deleted ids, and points RETURNED by
    * searches, not searches performed).
    */
  val pointInsertCount = new LongAdder
  val pointUpdateCount = new LongAdder
  val pointDeleteCount = new LongAdder
  val pointSearchCount = new LongAdder

  private val IdPattern = "collections/[a-zA-Z0-9]+".r

  /** The logger middleware's URL canonicalization (middleware.go:30–33). */
  def canonical(path: String): String =
    IdPattern.replaceAllIn(path, "collections/{collectionId}")

  /** Record one completed request (any status — rejections count too,
    * mirroring the outermost placement of the reference's logger
    * middleware).
    */
  def observe(status: Int, method: String, path: String,
      durationSeconds: Double, requestBytes: Long): Unit = {
    val key = (status.toString, method.toUpperCase, canonical(path))
    requestCount.getOrElseUpdate(key, new LongAdder).add(1L)
    requestDuration.getOrElseUpdate(key, new Histogram(DurationBuckets))
      .observe(durationSeconds)
    requestSize.getOrElseUpdate(key, new Histogram(SizeBuckets))
      .observe(requestBytes.toDouble)
  }

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def labelStr(k: (String, String, String)): String =
    s"""code="${k._1}",method="${k._2}",handler="${k._3}""""

  /** Prometheus text exposition (format 0.0.4) of every vector — the
    * body a `/metrics` endpoint returns.
    */
  def render(): String = {
    val sb = new StringBuilder
    sb.append("# HELP http_request_count Total number of HTTP requests made.\n")
    sb.append("# TYPE http_request_count counter\n")
    requestCount.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append("http_request_count{").append(labelStr(k)).append("} ")
        .append(v.sum()).append('\n')
    }
    sb.append("# HELP http_request_duration_seconds HTTP request latencies in seconds.\n")
    sb.append("# TYPE http_request_duration_seconds histogram\n")
    requestDuration.toSeq.sortBy(_._1).foreach { case (k, h) =>
      h.render(sb, "http_request_duration_seconds", labelStr(k))
    }
    sb.append("# HELP http_request_size_bytes HTTP request sizes in bytes.\n")
    sb.append("# TYPE http_request_size_bytes histogram\n")
    requestSize.toSeq.sortBy(_._1).foreach { case (k, h) =>
      h.render(sb, "http_request_size_bytes", labelStr(k))
    }
    def counter(name: String, help: String, v: LongAdder): Unit = {
      sb.append(s"# HELP $name $help\n")
      sb.append(s"# TYPE $name counter\n")
      sb.append(name).append(' ').append(v.sum()).append('\n')
    }
    counter("cluster_node_point_insert_count",
      "Total number of points inserted.", pointInsertCount)
    counter("cluster_node_point_update_count",
      "Total number of points updated.", pointUpdateCount)
    counter("cluster_node_point_delete_count",
      "Total number of points deleted.", pointDeleteCount)
    counter("cluster_node_point_search_count",
      "Total number of points searched.", pointSearchCount)
    sb.toString
  }
}
