package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Piece-indexer HTTP lookup (S4): `GET {base}/sample/{peerId}/{pieceCid}`
  * with retry ×5 and 404-vs-error discrimination, restated as a
  * distributed `mapPartitions` client with bounded per-partition
  * concurrency.
  *
  * reference: backend/lib/piece-indexer-service.js:19-46 —
  *   - `{"error":"PROVIDER_OR_PIECE_NOT_FOUND"}` is a MISS (None), not a
  *     failure (the deal advances its retry state machine);
  *   - `{"samples":[]}` is likewise a miss; `{"samples":[cid,…]}` → first;
  *   - anything else (transport failure after retries, unparseable body)
  *     is an ERROR, captured per-row in the `error` column instead of
  *     thrown — at 100 TB one bad row must dead-letter, not kill a stage
  *     (same discipline as the decode path's T3 tagging).
  *
  * Scale shape: the candidate set is the resolve tick's work queue
  * (≤ maxDeals rows), spread over partitions; each partition runs a
  * fixed pool of `concurrency` in-flight requests over one shared
  * keep-alive HTTP client. Total cluster concurrency =
  * partitions × concurrency, bounded by construction — the reference's
  * serial per-deal loop, batched and distributed.
  */
object PieceIndexer {

  /** Lookup result schema: payload_cid null + error null = clean miss. */
  val resultSchema: StructType = StructType(Seq(
    StructField("peerId", StringType, nullable = true),
    StructField("pieceCid", StringType, nullable = false),
    StructField("payloadCid", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  private val NotFound = "PROVIDER_OR_PIECE_NOT_FOUND"

  // ObjectMapper is thread-safe after configuration; one per JVM, not
  // one per request (per-request allocation is measurable churn at
  // thousands of lookups per partition)
  private lazy val mapper = new ObjectMapper()

  /** One request through the retry wrapper. Some(cid) = hit,
    * None = clean miss; throws after exhausted retries / parse failure. */
  def request(
      http: HttpClient,
      baseUrl: String,
      peerId: String,
      pieceCid: String,
      retries: Int = 5,
      sleep: Long => Unit = Thread.sleep): Option[String] =
    Retry.withRetries(attempts = retries, sleep = sleep) {
      val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/sample/$peerId/$pieceCid"))
        .header("content-type", "application/json")
        .timeout(Duration.ofSeconds(60))
        .GET().build()
      val body = http.send(req, HttpResponse.BodyHandlers.ofString()).body()
      val node = mapper.readTree(body)
      val err = node.get("error")
      if (err != null && err.asText() == NotFound) None
      else {
        val samples = node.get("samples")
        if (samples == null || !samples.isArray)
          throw new RuntimeException(s"unparseable piece-indexer response: $body")
        if (samples.isEmpty) None else Some(samples.get(0).asText())
      }
    }

  /** Distributed lookup over a candidate set.
    *
    * @param candidates  DataFrame with `peerId`, `pieceCid` columns (a
    *                    null peerId short-circuits to a clean miss — the
    *                    dimension join upstream may not know the miner)
    * @param concurrency max in-flight requests per partition
    * @return one row per candidate: (peerId, pieceCid, payloadCid, error)
    */
  def lookup(
      candidates: DataFrame,
      baseUrl: String,
      concurrency: Int = 4,
      retries: Int = 5): DataFrame = {
    val enc = Encoders.row(resultSchema)
    candidates.select("peerId", "pieceCid").mapPartitions { it =>
      val http = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(10)).build()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))

      val out = it.grouped(concurrency).flatMap { group =>
        // one bounded wave of in-flight requests; futures resolve before
        // the next wave starts, so partition memory stays O(concurrency)
        val futures = group.map { r =>
          val peer = r.getString(0)
          val piece = r.getString(1)
          pool.submit(new java.util.concurrent.Callable[Row] {
            override def call(): Row =
              if (peer == null) Row(null, piece, null, null)
              else try {
                Row(peer, piece, request(http, baseUrl, peer, piece, retries).orNull, null)
              } catch {
                case scala.util.control.NonFatal(e) =>
                  Row(peer, piece, null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
              }
          })
        }
        futures.map(_.get())
      }
      // shut the pool down when the iterator drains (normal completion;
      // the task-completion listener covers failure/kill)
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) pool.shutdown()
          h
        }
        override def next(): Row = out.next()
      }
    }(enc)
  }
}
