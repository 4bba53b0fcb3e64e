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
  *   - Requests whose `Origin` OR `Host` header is present and not a
  *     localhost value are rejected 403 on both endpoints — loopback
  *     binding alone does not stop DNS-rebinding (a hostile page
  *     resolving its own hostname to 127.0.0.1 could otherwise drive
  *     the engine from a browser and read answers over the same-origin
  *     SSE stream; its same-origin GET carries no Origin header, which
  *     is why Host is checked too).
  *   - Dead sessions are evicted two ways: a failed SSE write closes
  *     the stream, and a POST targeting a closed session answers 410
  *     Gone and removes it; a keepalive sweeper pings every session
  *     with an SSE comment frame (default every 15 s) so clients that
  *     disconnect and never POST again (EventSource reconnects) are
  *     reaped too. [[stop]] closes every live stream and the sweeper.
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
    def send(event: String, data: String): Boolean =
      write(s"event: $event\ndata: $data\n\n")
    /** SSE comment frame — ignored by clients, fails on a dead socket:
      * the keepalive probe that evicts silently-disconnected sessions
      * (lazy POST-driven eviction alone leaks one entry per client
      * that reconnects and never POSTs to its old session id). */
    def ping(): Boolean = write(": ping\n\n")
    private def write(frame: String): Boolean = synchronized {
      if (open) {
        try {
          out.write(frame.getBytes(UTF_8))
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

  /** Per-[[start]] server state, so [[stop]] can close every held
    * stream and halt the keepalive sweeper. */
  private final class ServerState(
      val sessions: ConcurrentHashMap[String, SseStream],
      val keepAlive: java.util.concurrent.ScheduledExecutorService)

  private val serverState = new ConcurrentHashMap[HttpServer, ServerState]()

  // Every [[start]] must be paired with [[stop]] — the state entry and
  // keepalive scheduler live until then (a live HttpServer is pinned
  // by its own dispatcher thread, so weak-keying could never reclaim
  // an abandoned-but-running server). The JVM-exit hook below is the
  // backstop (r10 ADVICE): servers a caller abandoned are stopped
  // deterministically at shutdown instead of leaking their map entry
  // and pinging until process death.
  private lazy val shutdownHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      val it = serverState.keySet().iterator()
      while (it.hasNext) { try stop(it.next()) catch { case _: Exception => () } }
    }, "graft-mcp-sse-shutdown"))

  /** Loopback origins a browser could legitimately present. Absent
    * Origin (curl, SDK clients) is allowed; anything else is a
    * cross-site caller and is refused. */
  /** The bare host of `h` ("host", "host:port", or a bracketed IPv6
    * literal with optional port) — or null when malformed. Exact
    * bracket handling (r10 ADVICE): "[::1]x" or "[::1].evil" must NOT
    * pass as loopback, so after stripping a bracketed literal the
    * remainder must be empty or a ":port" suffix. */
  private def bareHost(h: String): String =
    if (h.startsWith("[")) {
      val close = h.indexOf(']')
      if (close < 0) null
      else {
        val rest = h.substring(close + 1)
        if (rest.isEmpty || rest.startsWith(":")) h.substring(0, close + 1) else null
      }
    } else h.takeWhile(_ != ':')

  private[graft] def originAllowed(origin: Option[String]): Boolean =
    origin.forall { o =>
      val host = o.stripPrefix("http://").stripPrefix("https://")
        .takeWhile(_ != '/').toLowerCase
      val bare = bareHost(host)
      bare == "localhost" || bare == "127.0.0.1" || bare == "[::1]"
    }

  /** Host-header twin of [[originAllowed]] — a DNS-rebound page's
    * SAME-ORIGIN GET carries NO Origin header but does carry the
    * hostile hostname in Host, so the rebinding guard needs both
    * checks (per MCP HTTP-transport security guidance). Absent Host
    * (HTTP/1.0 tools) is allowed. */
  private[graft] def hostAllowed(host: Option[String]): Boolean =
    host.forall { h =>
      val bare = bareHost(h.toLowerCase)
      bare == "localhost" || bare == "127.0.0.1" || bare == "[::1]"
    }

  private def rejectNonLocal(ex: HttpExchange): Boolean = {
    val origin = Option(ex.getRequestHeaders.getFirst("Origin"))
    val host = Option(ex.getRequestHeaders.getFirst("Host"))
    val ok = originAllowed(origin) && hostAllowed(host)
    if (!ok) respond(ex, 403, "forbidden origin")
    !ok
  }

  /** Start serving `engine` on loopback `port` (0 = ephemeral; read
    * the bound port off the returned server). Caller stops via
    * [[stop]]. `keepAliveMillis` paces the SSE comment-frame heartbeat
    * that evicts silently-disconnected sessions.
    *
    * EVERY start() must be paired with a [[stop]] — the per-server
    * state (session map + keepalive scheduler) is only released there;
    * a server abandoned without stop() keeps serving and pinging until
    * the JVM-exit hook reaps it. */
  def start(engine: Engine, port: Int,
      keepAliveMillis: Long = 15000L): HttpServer = {
    shutdownHook // register the exit backstop once, on first start
    val sessions = new ConcurrentHashMap[String, SseStream]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    val keepAlive = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-mcp-sse-keepalive"); t.setDaemon(true); t
    })
    keepAlive.scheduleWithFixedDelay(() => {
      val it = sessions.entrySet().iterator()
      while (it.hasNext) { if (!it.next().getValue.ping()) it.remove() }
    }, keepAliveMillis, keepAliveMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
    serverState.put(server, new ServerState(sessions, keepAlive))
    server.setExecutor(Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-mcp-sse"); t.setDaemon(true); t
    }))

    server.createContext("/sse", (ex: HttpExchange) => {
      if (rejectNonLocal(ex)) ()
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
      if (rejectNonLocal(ex)) ()
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

  /** Stop `server`, close every live SSE stream, halt the keepalive
    * sweeper, and release the pool (idempotent). */
  def stop(server: HttpServer): Unit = {
    Option(serverState.remove(server)).foreach { st =>
      st.keepAlive.shutdownNow()
      st.sessions.values.forEach(_.close())
      st.sessions.clear()
    }
    server.stop(0)
    server.getExecutor match {
      case e: java.util.concurrent.ExecutorService => e.shutdownNow(); ()
      case _ => ()
    }
  }

  /** Live-session count for `server` (spec hook for eviction checks). */
  private[graft] def sessionCount(server: HttpServer): Int =
    Option(serverState.get(server)).map(_.sessions.size).getOrElse(0)

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
