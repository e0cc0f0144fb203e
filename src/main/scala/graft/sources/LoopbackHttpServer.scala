package graft.sources

import java.io.{File, FileInputStream, OutputStream}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import scala.collection.concurrent.TrieMap

/** JVM-lifetime loopback HTTP file server for the A3 remote-parquet
  * gate (`a3_http_parquet`) and its specs — the stand-in for the
  * reference's public mirror (config/default_settings.yaml:37) in a
  * zero-egress sandbox. Serves GET/HEAD with RFC 7233 single-range
  * support from a fixed root directory, which is exactly the protocol
  * surface [[HttpRangeFileSystem]] needs (HEAD for length, `bytes=a-b`
  * for footer/chunk reads, `bytes=a-` for sequential tails).
  *
  * One server per root, kept for the JVM's lifetime: catalog queries
  * return LAZY DataFrames that the driver materializes after the query
  * function has returned, so tearing the server down inside the query
  * would break the read. Counters expose how the client actually read
  * (full GETs vs ranged GETs) so specs can pin the seek behavior.
  */
object LoopbackHttpServer {

  final class Counters {
    val headRequests = new AtomicLong
    val fullGets = new AtomicLong
    val rangedGets = new AtomicLong
    val bytesServed = new AtomicLong
    /** Fault injection for resilience specs: the next N ranged GETs are
      * answered 503 (after counting them), exercising the client's
      * bounded-retry path without a flaky network. 0 = healthy.
      */
    val failNextRangedGets = new AtomicLong
    /** 503s actually served — lets a spec assert the faults were
      * consumed by retries rather than silently never hit.
      */
    val injectedFailures = new AtomicLong
    /** 404s served (missing file or traversal attempt) — lets a spec
      * assert a deterministic miss was asked exactly once, not retried.
      */
    val notFound = new AtomicLong

    def injectRangedFailures(n: Long): Unit = failNextRangedGets.set(n)
  }

  private case class Running(server: HttpServer, port: Int, counters: Counters)
  private val servers = TrieMap.empty[String, Running]
  private val RangeRe = "bytes=(\\d+)-(\\d*)".r

  /** Serve `rootDir` on an ephemeral loopback port; idempotent per
    * canonical root. Returns (port, counters).
    *
    * Every server thread must be a DAEMON: queries that serve scratch
    * data leave the server up for the JVM's lifetime (lazy DataFrames),
    * and a single non-daemon dispatcher thread would keep Verify/Bench
    * alive forever after main() returns. `HttpServer` spawns its
    * internal threads from the thread that calls create/start, and new
    * threads inherit daemon status — so both happen on a short-lived
    * daemon thread, and the handler pool gets an explicit daemon
    * ThreadFactory.
    */
  def serve(rootDir: String): (Int, Counters) = {
    val root = new File(rootDir).getCanonicalFile
    val r = servers.getOrElseUpdate(root.getPath, {
      val counters = new Counters
      @volatile var started: Either[Throwable, HttpServer] = null
      val starter = new Thread(() => {
        started =
          try {
            val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
            server.createContext("/", (ex: HttpExchange) => handle(ex, root, counters))
            server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
              4,
              (task: Runnable) => {
                val t = new Thread(task, "graft-loopback-http")
                t.setDaemon(true)
                t
              }))
            server.start()
            Right(server)
          } catch { case t: Throwable => Left(t) }
      }, "graft-loopback-http-starter")
      starter.setDaemon(true)
      starter.start()
      starter.join()
      started match {
        case Right(server) => Running(server, server.getAddress.getPort, counters)
        case Left(t) => throw t
      }
    })
    (r.port, r.counters)
  }

  private def handle(ex: HttpExchange, root: File, c: Counters): Unit = {
    try {
      val rel = ex.getRequestURI.getPath.stripPrefix("/")
      val target = new File(root, rel).getCanonicalFile
      // traversal guard: resolved target must stay under the root
      if (!target.getPath.startsWith(root.getPath + File.separator) || !target.isFile) {
        c.notFound.incrementAndGet()
        ex.sendResponseHeaders(404, -1); return
      }
      val len = target.length()
      ex.getResponseHeaders.set("Accept-Ranges", "bytes")
      ex.getRequestMethod match {
        case "HEAD" =>
          c.headRequests.incrementAndGet()
          ex.getResponseHeaders.set("Content-Length", len.toString)
          // -1 = no body; Content-Length header already set explicitly
          ex.sendResponseHeaders(200, -1)
        case "GET" =>
          Option(ex.getRequestHeaders.getFirst("Range")) match {
            case Some(RangeRe(fromS, toS)) =>
              c.rangedGets.incrementAndGet()
              if (c.failNextRangedGets.get() > 0 && c.failNextRangedGets.getAndDecrement() > 0) {
                c.injectedFailures.incrementAndGet()
                ex.sendResponseHeaders(503, -1); return
              }
              val from = fromS.toLong
              val to = if (toS.isEmpty) len - 1 else math.min(toS.toLong, len - 1)
              if (from > to || from >= len) {
                ex.getResponseHeaders.set("Content-Range", s"bytes */$len")
                ex.sendResponseHeaders(416, -1)
              } else {
                val n = to - from + 1
                ex.getResponseHeaders.set("Content-Range", s"bytes $from-$to/$len")
                ex.sendResponseHeaders(206, n)
                copyRange(target, from, n, ex.getResponseBody, c)
              }
            case _ =>
              c.fullGets.incrementAndGet()
              ex.sendResponseHeaders(200, len)
              copyRange(target, 0, len, ex.getResponseBody, c)
          }
        case _ => ex.sendResponseHeaders(405, -1)
      }
    } finally ex.close()
  }

  private def copyRange(f: File, from: Long, n: Long, out: OutputStream, c: Counters): Unit = {
    val in = new FileInputStream(f)
    try {
      var toSkip = from
      while (toSkip > 0) toSkip -= math.max(1, in.skip(toSkip))
      val buf = new Array[Byte](64 * 1024)
      var remaining = n
      while (remaining > 0) {
        val r = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
        if (r < 0) remaining = 0
        else { out.write(buf, 0, r); c.bytesServed.addAndGet(r); remaining -= r }
      }
    } finally in.close()
  }
}
