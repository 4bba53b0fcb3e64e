package graft.serve

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.api.Engine

/** MCP HTTP+SSE transport — the reference's second `ariadne serve`
  * transport (`/root/reference/src/ariadne_dbt/cli.py:154-161` passes
  * FastMCP `transport="sse"`): same 10-tool dispatch, same JSON-RPC
  * 2.0 framing as [[McpServer]] (every line goes through
  * `McpServer.handle`, so the three transports can never diverge),
  * carried over the public MCP 2024-11-05 HTTP+SSE wire shape:
  *
  *   GET  /sse                      → `text/event-stream`; first event
  *                                    is `event: endpoint` with the
  *                                    session's POST URI; JSON-RPC
  *                                    responses arrive as
  *                                    `event: message` frames.
  *   POST /messages?sessionId=<id>  → one JSON-RPC request per body;
  *                                    202 Accepted immediately, the
  *                                    response (if any — notifications
  *                                    produce none) is pushed over the
  *                                    session's SSE stream.
  *
  * Transport hygiene (per the MCP HTTP-transport security guidance):
  *
  *   - Requests carrying an `Origin` header that is not a localhost
  *     origin are rejected 403 on both endpoints — loopback binding
  *     alone does not stop DNS-rebinding (a hostile page resolving its
  *     own hostname to 127.0.0.1 could otherwise drive the engine from
  *     a browser and read answers over the same-origin SSE stream).
  *   - Dead sessions are evicted: a failed SSE write closes the stream
  *     and removes it from the session map, and a POST targeting a
  *     closed session answers 410 Gone instead of silently dropping
  *     the response. [[stop]] closes every live stream.
  *   - The `/messages` dispatch always answers the POST exchange, even
  *     if the engine throws (500), so clients never hang on a held
  *     exchange.
  *
  * Zero dependencies by design: the HTTP loop is the JDK's built-in
  * `com.sun.net.httpserver` (public Java SE API since 9/jdk.httpserver
  * module), SSE framing is ~10 lines of `event:`/`data:` text. Binds
  * loopback only — this is a local dev-tool transport, exactly like
  * the reference's.
  */
object McpSseServer {

  /** One connected SSE client: serialized frame writes over the held
    * response stream (POST handlers run on pool threads). `send`
    * reports whether the stream is still alive; a failed write closes
    * the underlying exchange so the caller can evict the session. */
  private final class SseStream(exchange: HttpExchange) {
    private val out: OutputStream = exchange.getResponseBody
    @volatile private var open = true
    def alive: Boolean = open
    def send(event: String, data: String): Boolean = synchronized {
      if (open) {
        try {
          out.write(s"event: $event\ndata: $data\n\n".getBytes(UTF_8))
          out.flush()
        } catch { case _: java.io.IOException => close() }
      }
      open
    }
    def close(): Unit = synchronized {
      open = false
      try exchange.close() catch { case _: Exception => () }
    }
  }

  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Live session maps, one per running server, so [[stop]] can close
    * every held stream (the map itself is per-[[start]] state). */
  private val serverSessions =
    new ConcurrentHashMap[HttpServer, ConcurrentHashMap[String, SseStream]]()

  /** Loopback origins a browser could legitimately present. Absent
    * Origin (curl, SDK clients) is allowed; anything else is a
    * cross-site caller and is refused. */
  private[graft] def originAllowed(origin: Option[String]): Boolean =
    origin.forall { o =>
      val host = o.stripPrefix("http://").stripPrefix("https://")
        .takeWhile(_ != '/').toLowerCase
      val bare = if (host.startsWith("[::1]")) "[::1]" else host.takeWhile(_ != ':')
      bare == "localhost" || bare == "127.0.0.1" || bare == "[::1]"
    }

  private def rejectOrigin(ex: HttpExchange): Boolean = {
    val origin = Option(ex.getRequestHeaders.getFirst("Origin"))
    val ok = originAllowed(origin)
    if (!ok) respond(ex, 403, "forbidden origin")
    !ok
  }

  /** Start serving `engine` on loopback `port` (0 = ephemeral; read
    * the bound port off the returned server). Caller stops via
    * [[stop]]. */
  def start(engine: Engine, port: Int): HttpServer = {
    val sessions = new ConcurrentHashMap[String, SseStream]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    serverSessions.put(server, sessions)
    server.setExecutor(Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-mcp-sse"); t.setDaemon(true); t
    }))

    server.createContext("/sse", (ex: HttpExchange) => {
      if (rejectOrigin(ex)) ()
      else if (ex.getRequestMethod != "GET") { respond(ex, 405, "GET only") }
      else {
        val sid = seq.incrementAndGet().toString +
          "-" + graft.util.Scratch.md5hex(ex.toString + System.nanoTime(), 8)
        val h = ex.getResponseHeaders
        h.set("Content-Type", "text/event-stream")
        h.set("Cache-Control", "no-cache")
        h.set("Connection", "keep-alive")
        ex.sendResponseHeaders(200, 0) // chunked, stream stays open
        val stream = new SseStream(ex)
        sessions.put(sid, stream)
        // MCP HTTP+SSE handshake: the client learns its POST endpoint
        // from the first event.
        if (!stream.send("endpoint", s"/messages?sessionId=$sid"))
          sessions.remove(sid)
      }
    })

    server.createContext("/messages", (ex: HttpExchange) => {
      if (rejectOrigin(ex)) ()
      else if (ex.getRequestMethod != "POST") { respond(ex, 405, "POST only") }
      else {
        val sid = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").collectFirst {
            case kv if kv.startsWith("sessionId=") => kv.stripPrefix("sessionId=")
          }
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        sid.flatMap(s => Option(sessions.get(s))) match {
          case None => respond(ex, 404, "unknown or missing sessionId")
          case Some(stream) if !stream.alive =>
            sid.foreach(sessions.remove(_)) // lazy eviction of dead sessions
            respond(ex, 410, "session closed")
          case Some(stream) =>
            // Same dispatch as stdio: one request line in, at most one
            // response out — pushed over the SSE stream, not the POST
            // response (the MCP HTTP+SSE contract). The POST exchange
            // is ALWAYS answered, even if dispatch throws.
            try {
              val delivered = McpServer.handle(engine, body)
                .forall(stream.send("message", _))
              if (delivered) respond(ex, 202, "Accepted")
              else { sid.foreach(sessions.remove(_)); respond(ex, 410, "session closed") }
            } catch {
              case scala.util.control.NonFatal(_) =>
                respond(ex, 500, "internal error")
            }
        }
      }
    })

    server.start()
    server
  }

  /** Stop `server`, close every live SSE stream, and release its pool
    * (idempotent). */
  def stop(server: HttpServer): Unit = {
    Option(serverSessions.remove(server)).foreach { sessions =>
      sessions.values.forEach(_.close())
      sessions.clear()
    }
    server.stop(0)
    server.getExecutor match {
      case e: java.util.concurrent.ExecutorService => e.shutdownNow(); ()
      case _ => ()
    }
  }

  /** Live-session count for `server` (spec hook for eviction checks). */
  private[graft] def sessionCount(server: HttpServer): Int =
    Option(serverSessions.get(server)).map(_.size).getOrElse(0)

  private def respond(ex: HttpExchange, code: Int, msg: String): Unit = {
    val bytes = msg.getBytes(UTF_8)
    try {
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      os.write(bytes)
    } catch { case _: java.io.IOException => () }
    finally ex.close()
  }
}
