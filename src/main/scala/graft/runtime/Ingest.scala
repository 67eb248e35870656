package graft.runtime

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType, LongType}

/** HTTP-ingest source — the parity surface for the reference's embedded
  * falcon API example (`/root/reference/src/examples/falcon_api/main.py`):
  * an HTTP endpoint hands request payloads to a generator loop which
  * `send`s them to the default output stream (`main.py:13-19`, `31-41`).
  *
  * Spark-native: `POST /ingest/<stream>` appends the body (plus arrival
  * timestamp) to the named registry stream; downstream Links tail it as a
  * normal stream. The reference's request-thread → generator-thread
  * hand-off (`main.py:31-41`) collapses into the registry append — the
  * broker and the buffer are the same durable log. Ingest batching is
  * per-request here (demo scale); a production front door would buffer
  * and append in bulk, which changes no consumer. */
class Ingest(spark: SparkSession, registry: StreamRegistry, port: Int = 0) {
  private var server: HttpServer = _

  val schema: StructType = StructType(Seq(
    StructField("value", StringType), StructField("ingest_ms", LongType)))

  /** Stream names come from an UNTRUSTED URL path: restrict to the
    * shared safe-token alphabet ([[StreamRegistry.validName]], also the
    * RouterLink data-derived-target guard) — "../x" or "a/b" would
    * otherwise become registry paths escaping the root (path traversal
    * via registry.write). */
  private def validStream(s: String): Boolean = StreamRegistry.validName(s)

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/ingest/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val stream = ex.getRequestURI.getPath.stripPrefix("/ingest/")
          if (ex.getRequestMethod != "POST") {
            ex.sendResponseHeaders(405, -1)
          } else if (!validStream(stream)) {
            val resp = """{"error": "invalid stream name"}"""
              .getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(400, resp.length)
            ex.getResponseBody.write(resp)
          } else {
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val df = spark.createDataFrame(
              java.util.List.of(Row(body, System.currentTimeMillis())), schema)
            registry.write(df, stream)
            val resp = """{"status": "accepted"}""".getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(202, resp.length)
            ex.getResponseBody.write(resp)
          }
        } catch {
          // a failed append (schema mismatch, IO error) must still answer —
          // otherwise the client hangs to its own timeout with no status
          case e: Exception =>
            System.err.println(s"[ingest] append failed: $e")
            try {
              val resp = """{"error": "append failed"}""".getBytes(StandardCharsets.UTF_8)
              ex.sendResponseHeaders(500, resp.length)
              ex.getResponseBody.write(resp)
            } catch { case _: Exception => () } // headers already sent
        } finally ex.close()
      }
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}
