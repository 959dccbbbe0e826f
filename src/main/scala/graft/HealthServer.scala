package graft

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** S13: the reference API's liveness route — `GET /` → 200 "OK"
  * (reference: api/lib/app.js:16-18). Plain JDK HttpServer, zero
  * dependencies; the health check is injectable so a deployment wires
  * real liveness (SparkSession active, store readable) behind the same
  * route. Not a Spark operator — it exists so a user of the reference
  * can point their uptime monitor at this engine unchanged.
  */
final class HealthServer(port: Int = 0, healthy: () => Boolean = () => true) {

  private val server = HttpServer.create(new InetSocketAddress("0.0.0.0", port), 0)
  server.createContext("/", (ex: HttpExchange) => {
    val (code, body) =
      try { if (healthy()) (200, "OK") else (503, "UNHEALTHY") }
      catch { case scala.util.control.NonFatal(_) => (503, "UNHEALTHY") }
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  })

  /** Start listening; returns the bound port (useful with port=0). */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = server.stop(0)
}
