package graft.runtime

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession

/** `GET /health` endpoint (reference `src/catenae/health.py:13-27`,
  * spawned at `catenae.py:307-309`, default port 2094 at `catenae.py:123`).
  *
  * JDK-built-in HttpServer (zero deps); reports broker-style availability
  * plus the live StreamingQuery states — the Spark-native health signal
  * (`query.status`) the reference cannot offer. */
class Health(spark: SparkSession, port: Int = 2094) {
  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/health", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        // a throwing handler must still answer AND close the exchange —
        // otherwise the probing client (a liveness probe) hangs to its
        // own timeout and the socket leaks (the Ingest handler's
        // discipline; spark.streams.active throws once the session stops)
        try {
          val queries = spark.streams.active.map { q =>
            s"""{"name":${Option(q.name).map(n => "\"" + Health.escapeJson(n) + "\"").getOrElse("null")},"isActive":${q.isActive}}"""
          }.mkString("[", ",", "]")
          val body = s"""{"status": "available", "queries": $queries}"""
            .getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
        } catch {
          case scala.util.control.NonFatal(_) =>
            try ex.sendResponseHeaders(500, -1)
            catch { case scala.util.control.NonFatal(_) => () }
        } finally ex.close()
      }
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}

object Health {
  /** Minimal JSON string escape — query names are arbitrary user strings
    * and an unescaped quote/backslash/control char breaks the payload. */
  private[runtime] def escapeJson(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }
}
