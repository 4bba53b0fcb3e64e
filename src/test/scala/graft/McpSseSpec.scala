package graft

import java.io.{BufferedReader, InputStreamReader}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.serve.{McpServer, McpSseServer}
import graft.util.JsonParse

/** MCP HTTP+SSE transport: endpoint handshake, request/response over
  * the stream, verbatim parity with the stdio framing (both route
  * through McpServer.handle), and transport-level error handling. */
class McpSseSpec extends SparkSuite {

  private def withServer[A](body: (Int, BufferedReader, String) => A): A = {
    val root = Files.createTempDirectory("graft_sse")
    Files.createDirectories(root.resolve("target"))
    for (f <- Seq("manifest.json", "catalog.json", "run_results.json"))
      Files.copy(java.nio.file.Paths.get(fixturePath(f)), root.resolve(s"target/$f"))
    val engine = graft.api.Engine.fromManifest(spark,
      root.resolve("target/manifest.json").toString, None,
      graft.config.Config.load(root))
    val server = McpSseServer.start(engine, 0)
    val port = server.getAddress.getPort
    try {
      val sse = new URL(s"http://127.0.0.1:$port/sse")
        .openConnection().asInstanceOf[HttpURLConnection]
      sse.setRequestMethod("GET")
      sse.setReadTimeout(30000)
      assert(sse.getResponseCode == 200)
      assert(sse.getContentType.startsWith("text/event-stream"))
      val reader = new BufferedReader(new InputStreamReader(sse.getInputStream, UTF_8))
      // handshake: first frame is the endpoint event
      val (ev, endpoint) = readFrame(reader)
      assert(ev == "endpoint")
      body(port, reader, endpoint)
    } finally McpSseServer.stop(server)
  }

  /** Read one `event:`/`data:` SSE frame (blank-line terminated),
    * skipping keepalive comment frames (`: ping`). */
  private def readFrame(r: BufferedReader): (String, String) = {
    var event = ""; var data = ""
    var sawEof = false
    do {
      event = ""; data = ""
      var line = r.readLine()
      sawEof = line == null
      while (line != null && line.nonEmpty) {
        if (line.startsWith("event: ")) event = line.stripPrefix("event: ")
        if (line.startsWith("data: ")) data = line.stripPrefix("data: ")
        line = r.readLine()
      }
    } while (!sawEof && event.isEmpty && data.isEmpty)
    (event, data)
  }

  private def post(port: Int, endpoint: String, body: String): Int = {
    val c = new URL(s"http://127.0.0.1:$port$endpoint")
      .openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.getOutputStream.write(body.getBytes(UTF_8))
    c.getOutputStream.close()
    val code = c.getResponseCode
    c.disconnect()
    code
  }

  test("handshake + initialize/tools-list/tools-call over the stream") {
    withServer { (port, reader, endpoint) =>
      assert(endpoint.startsWith("/messages?sessionId="),
        s"endpoint event must carry the session POST URI: $endpoint")

      assert(post(port, endpoint,
        """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{"protocolVersion":"2024-11-05","capabilities":{},"clientInfo":{"name":"spec","version":"0"}}}""") == 202)
      val (e1, init) = readFrame(reader)
      assert(e1 == "message")
      val initR = JsonParse.parse(init).asInstanceOf[Map[String, Any]]
      assert(initR("result").asInstanceOf[Map[String, Any]]("protocolVersion")
        == McpServer.ProtocolVersion)

      // notification: 202, no frame (verified implicitly — the next
      // frame answers the next request)
      assert(post(port, endpoint,
        """{"jsonrpc":"2.0","method":"notifications/initialized"}""") == 202)

      assert(post(port, endpoint,
        """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""") == 202)
      val tools = JsonParse.parse(readFrame(reader)._2).asInstanceOf[Map[String, Any]]
      assert(tools("id") == 2L)
      assert(tools("result").asInstanceOf[Map[String, Any]]("tools")
        .asInstanceOf[List[Map[String, Any]]].map(_("name"))
        == graft.serve.JsonLineServer.toolNames.toList)

      assert(post(port, endpoint,
        """{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"search_models","arguments":{"query":"orders","limit":5}}}""") == 202)
      val call = JsonParse.parse(readFrame(reader)._2).asInstanceOf[Map[String, Any]]
      val result = call("result").asInstanceOf[Map[String, Any]]
      assert(result("isError") == false)
      assert(result("content").asInstanceOf[List[Map[String, Any]]]
        .head("text").toString.contains("fct_orders"))
    }
  }

  test("SSE answers are verbatim the stdio framing's answers") {
    withServer { (port, reader, endpoint) =>
      val req = """{"jsonrpc":"2.0","id":9,"method":"tools/list"}"""
      assert(post(port, endpoint, req) == 202)
      val overSse = readFrame(reader)._2
      // the stdio transport on the same engine fixture answers identically
      val root = Files.createTempDirectory("graft_sse_parity")
      Files.createDirectories(root.resolve("target"))
      for (f <- Seq("manifest.json", "catalog.json", "run_results.json"))
        Files.copy(java.nio.file.Paths.get(fixturePath(f)), root.resolve(s"target/$f"))
      val engine = graft.api.Engine.fromManifest(spark,
        root.resolve("target/manifest.json").toString, None,
        graft.config.Config.load(root))
      val overStdio = McpServer.handle(engine, req).get
      assert(JsonParse.parse(overSse) == JsonParse.parse(overStdio))
    }
  }

  test("cross-site Origin is refused 403 on both endpoints (DNS-rebinding guard)") {
    withServer { (port, _, endpoint) =>
      // Raw socket: HttpURLConnection silently drops the restricted
      // Origin header, so the hostile request must be hand-framed.
      def withOrigin(path: String, method: String, origin: String): Int = {
        val sock = new java.net.Socket("127.0.0.1", port)
        try {
          val body =
            if (method == "POST") """{"jsonrpc":"2.0","id":1,"method":"tools/list"}"""
            else ""
          val req = s"$method $path HTTP/1.1\r\nHost: 127.0.0.1:$port\r\n" +
            s"Origin: $origin\r\nContent-Length: ${body.length}\r\n" +
            "Connection: close\r\n\r\n" + body
          sock.getOutputStream.write(req.getBytes(UTF_8))
          sock.getOutputStream.flush()
          val status = new BufferedReader(
            new InputStreamReader(sock.getInputStream, UTF_8)).readLine()
          status.split(" ")(1).toInt
        } finally sock.close()
      }
      // a hostile page that rebound its hostname to 127.0.0.1
      assert(withOrigin("/sse", "GET", "http://evil.example") == 403)
      assert(withOrigin(endpoint, "POST", "https://evil.example:8080") == 403)
      // the rebound page's SAME-ORIGIN GET carries no Origin header —
      // only the hostile Host value betrays it
      def withHost(host: String): Int = {
        val sock = new java.net.Socket("127.0.0.1", port)
        try {
          sock.getOutputStream.write(
            s"GET /sse HTTP/1.1\r\nHost: $host\r\nConnection: close\r\n\r\n".getBytes(UTF_8))
          sock.getOutputStream.flush()
          new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
            .readLine().split(" ")(1).toInt
        } finally sock.close()
      }
      assert(withHost("evil.example") == 403)
      assert(withHost("evil.example:80") == 403)
      import graft.serve.McpSseServer.hostAllowed
      assert(hostAllowed(None) && hostAllowed(Some("localhost:8000")) &&
        hostAllowed(Some("127.0.0.1")) && !hostAllowed(Some("localhost.evil.example")))
      // r10 ADVICE: the IPv6 literal must match EXACTLY "[::1]" or
      // "[::1]:<port>" — a host merely starting with the bracket
      // sequence is not loopback
      assert(hostAllowed(Some("[::1]")) && hostAllowed(Some("[::1]:8080")))
      assert(!hostAllowed(Some("[::1]x")) && !hostAllowed(Some("[::1].evil")) &&
        !hostAllowed(Some("[::2]")) && !hostAllowed(Some("[")))
      // a legitimate local browser client keeps working
      assert(withOrigin(endpoint, "POST", "http://localhost:3000") == 202)
      assert(withOrigin(endpoint, "POST", "http://127.0.0.1") == 202)
      // and the origin-allowlist logic itself
      import graft.serve.McpSseServer.originAllowed
      assert(originAllowed(None), "absent Origin (curl/SDK) is allowed")
      assert(originAllowed(Some("http://localhost:8123")))
      assert(originAllowed(Some("https://[::1]:9")))
      assert(!originAllowed(Some("http://localhost.evil.example")))
      assert(!originAllowed(Some("null")))
    }
  }

  test("a disconnected client's session is evicted; POSTs answer 410/404, not silent 202") {
    val root = Files.createTempDirectory("graft_sse_evict")
    Files.createDirectories(root.resolve("target"))
    for (f <- Seq("manifest.json", "catalog.json", "run_results.json"))
      Files.copy(java.nio.file.Paths.get(fixturePath(f)), root.resolve(s"target/$f"))
    val engine = graft.api.Engine.fromManifest(spark,
      root.resolve("target/manifest.json").toString, None,
      graft.config.Config.load(root))
    val server = McpSseServer.start(engine, 0)
    val port = server.getAddress.getPort
    try {
      // Raw socket so close() is a real TCP teardown, not a pooled
      // keep-alive return.
      val sock = new java.net.Socket("127.0.0.1", port)
      sock.getOutputStream.write(
        s"GET /sse HTTP/1.1\r\nHost: 127.0.0.1:$port\r\n\r\n".getBytes(UTF_8))
      sock.getOutputStream.flush()
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
      var line = in.readLine()
      while (line != null && line.nonEmpty) line = in.readLine() // headers
      // chunked body: scan for the endpoint data line
      var endpoint: String = null
      while (endpoint == null) {
        val l = in.readLine()
        assert(l != null, "stream ended before the endpoint event")
        if (l.startsWith("data: ")) endpoint = l.stripPrefix("data: ")
      }
      assert(McpSseServer.sessionCount(server) == 1)
      sock.close()
      // The first write after close may land in the OS buffer; within a
      // few POSTs the failed write must evict the session (410), after
      // which the id is unknown (404). 202s may precede, but never
      // follow, the eviction.
      val req = """{"jsonrpc":"2.0","id":7,"method":"tools/list"}"""
      val codes = (1 to 20).iterator
        .map(_ => post(port, endpoint, req))
        .takeWhile(_ == 202).toList
      assert(codes.length < 20, s"POSTs to a closed session stayed 202 forever")
      val after = post(port, endpoint, req)
      assert(after == 410 || after == 404, s"expected 410/404 after eviction, got $after")
      assert(McpSseServer.sessionCount(server) == 0, "dead session must leave the map")
    } finally McpSseServer.stop(server)
  }

  test("keepalive sweeper evicts a disconnected client that never POSTs") {
    // The EventSource-reconnect leak: a client opens /sse, drops, and
    // only ever talks to its NEW session — nothing POSTs to the old id,
    // so only the heartbeat can discover the dead socket.
    val root = Files.createTempDirectory("graft_sse_keepalive")
    Files.createDirectories(root.resolve("target"))
    for (f <- Seq("manifest.json", "catalog.json", "run_results.json"))
      Files.copy(java.nio.file.Paths.get(fixturePath(f)), root.resolve(s"target/$f"))
    val engine = graft.api.Engine.fromManifest(spark,
      root.resolve("target/manifest.json").toString, None,
      graft.config.Config.load(root))
    val server = McpSseServer.start(engine, 0, keepAliveMillis = 100L)
    val port = server.getAddress.getPort
    try {
      val sock = new java.net.Socket("127.0.0.1", port)
      sock.getOutputStream.write(
        s"GET /sse HTTP/1.1\r\nHost: 127.0.0.1:$port\r\n\r\n".getBytes(UTF_8))
      sock.getOutputStream.flush()
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
      var line = in.readLine()
      while (line != null && !line.startsWith("data: ")) line = in.readLine()
      assert(McpSseServer.sessionCount(server) == 1)
      sock.close() // client gone; NO POST ever targets this session
      val deadline = System.currentTimeMillis() + 10000
      while (McpSseServer.sessionCount(server) > 0 &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(McpSseServer.sessionCount(server) == 0,
        "the heartbeat must reap a silently-disconnected session")
    } finally McpSseServer.stop(server)
  }

  test("stop() closes live streams and empties the session map") {
    withServer { (port, reader, endpoint) =>
      val root = Files.createTempDirectory("graft_sse_stop")
      Files.createDirectories(root.resolve("target"))
      for (f <- Seq("manifest.json", "catalog.json", "run_results.json"))
        Files.copy(java.nio.file.Paths.get(fixturePath(f)), root.resolve(s"target/$f"))
      val engine = graft.api.Engine.fromManifest(spark,
        root.resolve("target/manifest.json").toString, None,
        graft.config.Config.load(root))
      val server2 = McpSseServer.start(engine, 0)
      val port2 = server2.getAddress.getPort
      val sse = new URL(s"http://127.0.0.1:$port2/sse")
        .openConnection().asInstanceOf[HttpURLConnection]
      sse.setRequestMethod("GET")
      sse.setReadTimeout(30000)
      val r2 = new BufferedReader(new InputStreamReader(sse.getInputStream, UTF_8))
      readFrame(r2) // handshake
      assert(McpSseServer.sessionCount(server2) == 1)
      McpSseServer.stop(server2)
      assert(McpSseServer.sessionCount(server2) == 0)
      // the held stream is closed: the blocked read terminates instead
      // of waiting out its 30 s timeout (EOF or connection reset)
      try r2.readLine() catch { case _: java.io.IOException => () }
      // the first server is untouched by stopping the second
      assert(post(port, endpoint,
        """{"jsonrpc":"2.0","id":8,"method":"tools/list"}""") == 202)
      readFrame(reader)
    }
  }

  test("transport errors: bad session 404, wrong methods 405") {
    withServer { (port, _, _) =>
      assert(post(port, "/messages?sessionId=nope", """{"jsonrpc":"2.0"}""") == 404)
      assert(post(port, "/messages", """{}""") == 404)
      val c = new URL(s"http://127.0.0.1:$port/messages")
        .openConnection().asInstanceOf[HttpURLConnection]
      c.setRequestMethod("GET")
      assert(c.getResponseCode == 405)
      c.disconnect()
    }
  }
}
