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
        val queries = spark.streams.active.map { q =>
          s"""{"name":${Option(q.name).map(n => s""""$n"""").getOrElse("null")},"isActive":${q.isActive}}"""
        }.mkString("[", ",", "]")
        val body = s"""{"status": "available", "queries": $queries}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}
