package graft.sources

import com.fasterxml.jackson.databind.JsonNode

/** Shared JSON-RPC 2.0 POST with the transport discipline every live
  * leg uses (reference backend/lib/rpc-service/service.js:19-44):
  * bounded retries with exponential backoff, a RANDOM endpoint pick
  * per attempt (a sick node is skipped with probability (n-1)/n per
  * retry), optional bearer token, and error/result envelope checks.
  * Extracted from [[RpcTransport]] so the miner→peerID clients
  * ([[MinerPeerIdClient]]) reuse the exact same machinery. */
object JsonRpc {

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private lazy val defaultHttp = java.net.http.HttpClient.newBuilder().build()

  /** One JSON-RPC call; returns the `result` node. Throws after the
    * retry budget on transport failure, non-2xx, an `error` member, or
    * a missing `result`. `params` is a pre-rendered JSON array. */
  def post(
      endpoints: Seq[String],
      method: String,
      params: String,
      authToken: Option[String] = None,
      attempts: Int = 5,
      timeoutMs: Int = 60000,
      sleep: Long => Unit = Thread.sleep,
      http: java.net.http.HttpClient = defaultHttp,
      rnd: java.util.Random = new java.util.Random()): JsonNode = {
    require(endpoints.nonEmpty, "JsonRpc.post needs at least one endpoint")
    Retry.withRetries(attempts = attempts, sleep = sleep) {
      val endpoint = endpoints(rnd.nextInt(endpoints.length))
      val body = s"""{"method":"$method","params":$params,"id":1,"jsonrpc":"2.0"}"""
      val builder = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .header("content-type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      authToken.foreach(t => builder.header("Authorization", s"Bearer $t"))
      val resp = http.send(builder.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"RPC $method failed - HTTP ${resp.statusCode()}: ${resp.body().take(512)}")
      val json = mapper.readTree(resp.body())
      val err = json.get("error")
      if (err != null) throw new java.io.IOException(s"RPC $method error: $err")
      val result = json.get("result")
      if (result == null)
        throw new java.io.IOException(s"RPC $method response missing result")
      result
    }
  }
}
