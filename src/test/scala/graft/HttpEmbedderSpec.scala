package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ingest.{Embed, HttpBatchEmbedder}
import graft.model.{ErrorCodes, GraftException}

/** HttpBatchEmbedder against a local JDK stub server: wire shape, ordering,
  * sub-batching, retry policy, and the governed error codes — plus the
  * end-to-end Embed.withEmbeddings integration (one partition-batch call,
  * supplied embeddings passing through untouched).
  */
class HttpEmbedderSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Deterministic stub vector: v[j] = ((len(text) + j) % 7) / 10f. */
  private def stubVec(text: String, dim: Int): Array[Float] =
    Array.tabulate(dim)(j => ((text.length + j) % 7) / 10.0f)

  /** Start a stub embedding server; `failFirst` requests return HTTP 500.
    * `seenAuth` records the auth-header value of the last request (null if
    * absent); `respondDim` overrides the response vector width.
    */
  private def withServer(
      failFirst: Int = 0, status: Int = 200,
      seenAuth: java.util.concurrent.atomic.AtomicReference[String] = null,
      respondDim: Int = -1)(
      body: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new AtomicInteger(0)
    server.createContext("/embed", (ex: HttpExchange) => {
      val n = requests.incrementAndGet()
      if (seenAuth != null)
        seenAuth.set(ex.getRequestHeaders.getFirst("Authorization"))
      val reqJson = mapper.readTree(ex.getRequestBody.readAllBytes())
      val input = reqJson.get("input")
      val dim = if (respondDim > 0) respondDim else reqJson.get("dimension").intValue()
      if (n <= failFirst) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else if (status != 200) {
        ex.sendResponseHeaders(status, -1); ex.close()
      } else {
        val root = mapper.createObjectNode()
        val data = root.putArray("data")
        (0 until input.size()).foreach { i =>
          val e = data.addObject().putArray("embedding")
          stubVec(input.get(i).asText(), dim).foreach(e.add)
        }
        val bytes = mapper.writeValueAsBytes(root)
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/embed", requests)
    finally server.stop(0)
  }

  test("batch embed returns one vector per text, in order, honoring sub-batch size") {
    withServer() { (url, requests) =>
      val e = new HttpBatchEmbedder(url, dimension = 8, batchSize = 2, backoffMs = 10)
      val texts = Seq("a", "bb", "ccc", "dddd", "eeeee")
      val got = e.embedBatch(texts)
      assert(got.length == 5)
      texts.zip(got).foreach { case (t, v) =>
        assert(v.toSeq == stubVec(t, 8).toSeq, s"vector mismatch for '$t'")
      }
      assert(requests.get() == 3, "5 texts at batchSize=2 must be 3 POSTs")
    }
  }

  test("transient 5xx retries then succeeds") {
    withServer(failFirst = 1) { (url, requests) =>
      val e = new HttpBatchEmbedder(url, dimension = 4, maxRetries = 2, backoffMs = 10)
      val got = e.embedBatch(Seq("hello"))
      assert(got.head.toSeq == stubVec("hello", 4).toSeq)
      assert(requests.get() == 2, "one failure + one success")
    }
  }

  test("exhausted retries surface vector_provider_dependency_unavailable") {
    withServer(failFirst = Int.MaxValue) { (url, requests) =>
      val e = new HttpBatchEmbedder(url, dimension = 4, maxRetries = 1, backoffMs = 10)
      val ex = intercept[GraftException](e.embedBatch(Seq("x")))
      assert(ex.code == ErrorCodes.VectorProviderDependencyUnavailable)
      assert(requests.get() == 2, "initial attempt + 1 retry")
    }
  }

  test("non-retryable 4xx is embedding_batch_invalid immediately") {
    withServer(status = 404) { (url, requests) =>
      val e = new HttpBatchEmbedder(url, dimension = 4, maxRetries = 3, backoffMs = 10)
      val ex = intercept[GraftException](e.embedBatch(Seq("x")))
      assert(ex.code == ErrorCodes.EmbeddingBatchInvalid)
      assert(requests.get() == 1, "4xx must not retry")
    }
  }

  test("unreachable endpoint is vector_provider_dependency_unavailable") {
    // bind-then-close guarantees a dead port
    val dead = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = dead.getAddress.getPort
    dead.start(); dead.stop(0)
    val e = new HttpBatchEmbedder(s"http://127.0.0.1:$port/embed",
      dimension = 4, maxRetries = 0, backoffMs = 10, connectTimeoutMs = 500)
    val ex = intercept[GraftException](e.embedBatch(Seq("x")))
    assert(ex.code == ErrorCodes.VectorProviderDependencyUnavailable)
  }

  test("Embed.withEmbeddings fills missing vectors via HTTP; supplied ones pass through") {
    withServer() { (url, _) =>
      val e = new HttpBatchEmbedder(url, dimension = 4, backoffMs = 10)
      val schema = StructType(Seq(
        StructField("id", StringType),
        StructField("content", StringType),
        StructField("embedding", ArrayType(FloatType), nullable = true)))
      val supplied = Seq(0.9f, 0.9f, 0.9f, 0.9f)
      val rows = java.util.Arrays.asList(
        Row("d1", "abc", null),
        Row("d2", "zz", supplied),
        Row("d3", "hello", null))
      val df = spark.createDataFrame(rows, schema).repartition(2)
      val out = Embed.withEmbeddings(df, e)
        .collect().map(r => r.getString(0) -> r.getSeq[Float](2)).toMap
      assert(out("d1") == stubVec("abc", 4).toSeq)
      assert(out("d2") == supplied, "supplied embedding must pass through unembedded")
      assert(out("d3") == stubVec("hello", 4).toSeq)
    }
  }

  test("fromEnv: missing endpoint config fails closed with the provider code") {
    val ex = intercept[GraftException](HttpBatchEmbedder.fromEnv(Map.empty))
    assert(ex.code == ErrorCodes.VectorProviderDependencyUnavailable)
  }

  test("api key arrives as the configured auth header; absent key sends none") {
    val seen = new java.util.concurrent.atomic.AtomicReference[String]("unset")
    withServer(seenAuth = seen) { (url, _) =>
      new HttpBatchEmbedder(url, dimension = 4, backoffMs = 10,
        apiKey = Some("sk-test-123")).embedBatch(Seq("x"))
      assert(seen.get() == "Bearer sk-test-123")
      new HttpBatchEmbedder(url, dimension = 4, backoffMs = 10).embedBatch(Seq("x"))
      assert(seen.get() == null, "no key => no Authorization header")
    }
  }

  test("toString never exposes the api key") {
    val e = new HttpBatchEmbedder("http://h/e", 4, apiKey = Some("sk-secret"))
    assert(!e.toString.contains("sk-secret"))
  }

  test("wrong-width response vectors are embedding_batch_invalid at parse time") {
    withServer(respondDim = 7) { (url, _) =>
      val e = new HttpBatchEmbedder(url, dimension = 4, backoffMs = 10)
      val ex = intercept[GraftException](e.embedBatch(Seq("x")))
      assert(ex.code == ErrorCodes.EmbeddingBatchInvalid)
    }
  }

  test("fromEnv: unparseable or non-positive GRAFT_EMBED_DIM fails loudly") {
    val base = Map("GRAFT_EMBED_ENDPOINT" -> "http://h/e")
    assert(intercept[GraftException](
      HttpBatchEmbedder.fromEnv(base + ("GRAFT_EMBED_DIM" -> "not-a-number"))).code
      == ErrorCodes.EmbeddingInvalid)
    assert(intercept[GraftException](
      HttpBatchEmbedder.fromEnv(base + ("GRAFT_EMBED_DIM" -> "0"))).code
      == ErrorCodes.EmbeddingInvalid)
    assert(HttpBatchEmbedder.fromEnv(base).dimension == 768, "absent dim defaults")
    assert(HttpBatchEmbedder.fromEnv(base + ("GRAFT_EMBED_DIM" -> "64")).dimension == 64)
  }
}
