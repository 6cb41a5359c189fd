package graft

import org.apache.spark.sql.SparkSession
import graft.ingest.HttpBatchEmbedder

/** Authenticated-client factory — the engine analog of the reference's
  * `auth.get_client()` (auth.py:7-15): build an [[Api]] whose embedding
  * provider is configured from the LLM_* settings, failing loudly when the
  * base URL is absent. Token resolution mirrors the reference's
  * `LLM_TOKEN`-then-`LLM_API_KEY` fallback; the token is held only inside
  * the embedder (never logged — HttpBatchEmbedder redacts it from
  * toString). The reference's `verify` flag disables SSL verification on
  * its HTTP stack; transport-level TLS toggling is deployment config out
  * of engine scope here (the JVM trust store governs), so LLM_SSL_VERIFY
  * is accepted and ignored-with-documentation rather than silently
  * dropped.
  */
object Auth {

  def getClient(
      spark: SparkSession,
      warehouseDir: String,
      env: Map[String, String] = sys.env): Api = {
    val baseUrl = env.getOrElse("LLM_BASE_URL",
      throw new RuntimeException("LLM_BASE_URL not set"))
    if (baseUrl.isEmpty) throw new RuntimeException("LLM_BASE_URL not set")
    val token = env.get("LLM_TOKEN").filter(_.nonEmpty)
      .orElse(env.get("LLM_API_KEY").filter(_.nonEmpty))
    val dim = env.get("GRAFT_EMBED_DIM").flatMap(_.toIntOption).getOrElse(768)
    new Api(spark, warehouseDir,
      new HttpBatchEmbedder(baseUrl, dim, apiKey = token))
  }
}
