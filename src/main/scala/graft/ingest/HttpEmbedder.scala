package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import com.fasterxml.jackson.databind.ObjectMapper
import graft.model.{ErrorCodes, GraftException}

/** Live batch embedder over an HTTP endpoint — the engine's analog of the
  * reference's remote embedding model client (`get_text_embedding_batch`,
  * reference: vector_mcp/vectordb/base.py:52-58, with the provider firewall
  * codes of vector_api.py:268-282).
  *
  * Wire shape (the de-facto public embeddings-API contract):
  * request `{"input": ["text", ...], "dimension": d}`, response
  * `{"data": [{"embedding": [f, ...]}, ...]}` with one entry per input, in
  * order. Jackson (already on the Spark classpath) does the JSON.
  *
  * Executor behavior: [[Embed.withEmbeddings]] calls [[embedBatch]] once per
  * partition; this class sub-batches to `batchSize` texts per POST so one
  * huge partition cannot build an unbounded request body. The HTTP client is
  * `@transient lazy` — the embedder ships to executors as plain config and
  * each executor builds its own connection pool.
  *
  * Error taxonomy (governed, never leaks transport details):
  *  - non-retryable HTTP 4xx or an unparseable/miscounted response →
  *    `embedding_batch_invalid`;
  *  - connect/IO failure, 429 or 5xx, retried `maxRetries` times with
  *    deterministic exponential backoff, then →
  *    `vector_provider_dependency_unavailable`.
  *
  * Authentication: `apiKey` (sent as `authHeader: <prefix><key>`, default
  * `Authorization: Bearer <key>`) covers the bearer-token and x-api-key
  * styles every real embeddings endpoint uses. The key is config, never
  * logged, and excluded from toString.
  */
final class HttpBatchEmbedder(
    val endpoint: String,
    val dimension: Int,
    val batchSize: Int = 256,
    val connectTimeoutMs: Int = 5000,
    val requestTimeoutMs: Int = 60000,
    val maxRetries: Int = 3,
    val backoffMs: Int = 250,
    apiKey: Option[String] = None,
    val authHeader: String = "Authorization",
    val authPrefix: String = "Bearer ") extends Embedder {

  override def toString: String =
    s"HttpBatchEmbedder($endpoint, dim=$dimension${if (apiKey.isDefined) ", auth=set" else ""})"

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs.toLong))
    .build()
  @transient private lazy val mapper = new ObjectMapper()

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    if (texts.isEmpty) Nil
    else texts.grouped(math.max(1, batchSize)).flatMap(postBatch).toSeq

  private def postBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("input")
    texts.foreach(arr.add)
    root.put("dimension", dimension)
    val builder = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(requestTimeoutMs.toLong))
      .header("Content-Type", "application/json")
    apiKey.foreach(k => builder.header(authHeader, authPrefix + k))
    val req = builder
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root)))
      .build()
    var attempt = 0
    while (true) {
      val outcome: Either[Throwable, Seq[Array[Float]]] =
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          val code = resp.statusCode()
          if (code == 200) Right(parse(resp.body(), texts.length))
          else if (code == 429 || code >= 500)
            Left(new GraftException(ErrorCodes.VectorProviderDependencyUnavailable))
          else Left(new GraftException(ErrorCodes.EmbeddingBatchInvalid))
        } catch {
          case e: java.io.IOException => Left(e)
          case e: InterruptedException => Thread.currentThread().interrupt(); throw e
        }
      outcome match {
        case Right(vecs) => return vecs
        case Left(e: GraftException) if e.code == ErrorCodes.EmbeddingBatchInvalid =>
          throw e // malformed request/response: retrying cannot help
        case Left(e) =>
          if (attempt >= maxRetries) e match {
            case g: GraftException => throw g
            case _ => throw new GraftException(ErrorCodes.VectorProviderDependencyUnavailable)
          }
          Thread.sleep(backoffMs.toLong << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def parse(body: String, expected: Int): Seq[Array[Float]] =
    try {
      val data = mapper.readTree(body).get("data")
      if (data == null || !data.isArray || data.size() != expected)
        throw new GraftException(ErrorCodes.EmbeddingBatchInvalid)
      (0 until data.size()).map { i =>
        val emb = data.get(i).get("embedding")
        // wrong-width vectors fail HERE with the governed code, not later
        // in an opaque dimension-mismatch downstream
        if (emb == null || !emb.isArray || emb.size() != dimension)
          throw new GraftException(ErrorCodes.EmbeddingBatchInvalid)
        Array.tabulate(emb.size())(j => emb.get(j).floatValue())
      }
    } catch {
      case g: GraftException => throw g
      case _: Exception => throw new GraftException(ErrorCodes.EmbeddingBatchInvalid)
    }
}

object HttpBatchEmbedder {
  /** Config-driven construction: GRAFT_EMBED_ENDPOINT + GRAFT_EMBED_DIM.
    * Absent config is the governed provider-unavailable error, mirroring the
    * reference's fail-closed optional-dependency boundary
    * (vector_mcp/vectordb/db_utils.py:66-105).
    */
  def fromEnv(env: Map[String, String] = sys.env): HttpBatchEmbedder = {
    val endpoint = env.getOrElse("GRAFT_EMBED_ENDPOINT",
      throw new GraftException(ErrorCodes.VectorProviderDependencyUnavailable))
    // an unparseable dimension is a config ERROR, not a silent 768 fallback
    val dim = env.get("GRAFT_EMBED_DIM") match {
      case None => 768
      case Some(s) => s.toIntOption.filter(_ > 0).getOrElse(
        throw new GraftException(ErrorCodes.EmbeddingInvalid))
    }
    new HttpBatchEmbedder(endpoint, dim,
      apiKey = env.get("GRAFT_EMBED_API_KEY"),
      authHeader = env.getOrElse("GRAFT_EMBED_AUTH_HEADER", "Authorization"),
      authPrefix = env.getOrElse("GRAFT_EMBED_AUTH_PREFIX", "Bearer "))
  }
}
