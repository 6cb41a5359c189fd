package graft.model

import org.apache.spark.sql.types._

/** Core record types of the engine.
  *
  * Mirrors the reference's `Document` TypedDict
  * (reference: vector_mcp/vectordb/base.py:12-24) and `QueryResults`
  * (base.py:27-31), re-expressed as Spark-friendly case classes with
  * stable Encoders.
  */
final case class Document(
    id: String,
    content: String,
    metadata: Map[String, String],
    embedding: Option[Seq[Float]]
)

/** One (document, score) hit for one input query.
  * Reference shape: list[list[tuple[Document, float]]] — flattened here to a
  * DataFrame-friendly row keyed by `query_idx`.
  */
final case class SearchHit(
    query_idx: Int,
    id: String,
    content: String,
    metadata: Map[String, String],
    score: Double
)

/** Collection catalog row (mirrors vector_mcp_collections,
  * reference: vector_mcp/vectordb/postgres.py:106-115).
  */
final case class CollectionEntry(
    collection_name: String,
    table_name: String,
    dimension: Int
)

object Schemas {
  /** Physical documents-table schema for a collection.
    * id STRING, content STRING, metadata MAP<STRING,STRING>,
    * embedding ARRAY<FLOAT>, norm DOUBLE (engine-added, precomputed L2 norm
    * so cosine scoring never recomputes it per query).
    */
  val documents: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    StructField("norm", DoubleType, nullable = true)
  ))

  /** Physical layout of [[documents]]: plus the id-hash `bucket` partition
    * column (Ingest.idBucket), so writes rewrite only touched buckets and
    * point reads prune partitions. Declared (not inferred) to pin the type.
    */
  val documentsPhysical: StructType =
    StructType(documents.fields :+ StructField("bucket", IntegerType, nullable = true))

  val catalog: StructType = StructType(Seq(
    StructField("collection_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("dimension", IntegerType, nullable = false)
  ))
}

/** Stable error taxonomy — byte-exact with the reference
  * (vector_mcp/vector_api.py, asserted in tests/test_vector_api.py:115-126).
  * Codes must match ^[a-z][a-z0-9_]{0,63}$; anything non-conforming is
  * collapsed by the firewall (vector_api.py:268-282).
  */
object ErrorCodes {
  val CollectionNameInvalid = "collection_name_invalid"
  val CollectionExists = "collection_exists"
  val CollectionNotFound = "collection_not_found"
  val CollectionVectorSchemaMismatch = "collection_vector_schema_mismatch"
  val SearchQuestionInvalid = "search_question_invalid"
  val ResultCountInvalid = "result_count_invalid"
  val SearchParametersInvalid = "search_parameters_invalid"
  val SemanticWeightInvalid = "semantic_weight_invalid"
  val LexicalWeightInvalid = "lexical_weight_invalid"
  val SearchWeightsInvalid = "search_weights_invalid"
  val RrfKInvalid = "rrf_k_invalid"
  val DeleteConfirmationRequired = "delete_confirmation_required"
  val DocumentContentInvalid = "document_content_invalid"
  val DocumentCountExceeded = "document_count_exceeded"
  val DocumentTotalSizeExceeded = "document_total_size_exceeded"
  val DocumentInputRequired = "document_input_required"
  val DocumentIdsRequired = "document_ids_required"
  val DocumentIdsDuplicate = "document_ids_duplicate"
  val DocumentExists = "document_exists"
  val EmbeddingBatchInvalid = "embedding_batch_invalid"
  val EmbeddingInvalid = "embedding_invalid"
  val VectorBackendOperationFailed = "vector_backend_operation_failed"
  // reference firewall's second terminal code (vector_api.py:268-282):
  // a required external provider (embedding model endpoint) is unreachable
  val VectorProviderDependencyUnavailable = "vector_provider_dependency_unavailable"
  val CollectionActionInvalid = "collection_action_invalid"
  val SearchActionInvalid = "search_action_invalid"
  val VectorBackendNotConfigured = "vector_backend_not_configured"
  val VectorBackendUnsupported = "vector_backend_unsupported"
  // engine extension: the reference parses PDF/EPUB via SimpleDirectoryReader
  // deps (pyproject.toml:8); this engine has no binary-document parser, and a
  // silent text-read of one would ingest garbage — fail governed instead
  val DocumentParseUnsupported = "document_parse_unsupported"
  // engine extension (no reference analog — its backends build indexes at
  // DDL time): requesting an index-served search before the index is built
  val AnnIndexNotFound = "ann_index_not_found"
  // engine extension: content-dedup gate requested before buildMinHashIndex
  val DedupIndexNotFound = "dedup_index_not_found"

  private val Stable = "^[a-z][a-z0-9_]{0,63}$".r

  /** Error firewall (vector_api.py:268-282): stable lowercase codes pass
    * through; anything else collapses to vector_backend_operation_failed so
    * backend internals never leak.
    */
  def firewall(message: String): String =
    if (message != null && Stable.matches(message)) message
    else VectorBackendOperationFailed
}

/** Fail-closed availability policy for backend selection
  * (reference: vector_mcp/backend_policy.py:7-31). The Spark engine serves
  * every canonical backend name through the one DataFrame implementation,
  * but the POLICY itself — canonicalization, the frozen allow-list, and the
  * two error codes — is observable API surface and kept byte-exact.
  */
object BackendPolicy {
  val AvailableBackends: Set[String] =
    Set("epistemic_graph", "mongodb", "postgres", "qdrant")

  val DefaultBackend = "epistemic_graph"

  def canonicalBackend(value: String): String =
    Option(value).getOrElse("").trim.toLowerCase

  /** Canonical backend, or the governed error before anything loads
    * (backend_policy.py:23-31): empty -> vector_backend_not_configured,
    * unknown -> vector_backend_unsupported.
    */
  def ensureBackendAvailable(value: String): String = {
    val backend = canonicalBackend(value)
    if (backend.isEmpty)
      throw new GraftException(ErrorCodes.VectorBackendNotConfigured)
    if (!AvailableBackends.contains(backend))
      throw new GraftException(ErrorCodes.VectorBackendUnsupported)
    backend
  }

  /** mcp_server.py:46-50: explicit value, else the configured default. */
  def resolve(value: String, configuredDefault: String = DefaultBackend): String =
    ensureBackendAvailable(
      Option(value).filter(_.nonEmpty).getOrElse(configuredDefault))

  /** Non-throwing status probe (backend_policy.py:34-56, the doctor
    * surface): reports availability instead of raising. Connection-level
    * checks (endpoints, credentials, TLS) are infrastructure config out of
    * engine scope — on Spark, "available" means the engine serves it.
    */
  final case class BackendStatus(
      backend: String, available: Boolean, reason: String, advisory: Option[String])

  def backendStatus(value: String): BackendStatus = {
    val backend = canonicalBackend(value)
    if (backend.isEmpty)
      BackendStatus("", available = false, "vector backend is not configured", None)
    else if (!AvailableBackends.contains(backend))
      BackendStatus(backend, available = false, "unsupported vector backend", None)
    else
      BackendStatus(backend, available = true, "available", None)
  }
}

/** Engine exception carrying a stable error code. */
final class GraftException(val code: String)
    extends RuntimeException(code)

object Limits {
  // vector_api.py:47-49
  val MaxDocumentBytes: Long = 16L * 1024 * 1024
  val MaxDocuments: Int = 1000
  val MaxDocumentTotalBytes: Long = 512L * 1024 * 1024
  // document_inputs.py:13-16
  val MaxFileBytes: Long = 64L * 1024 * 1024
  val MaxFiles: Int = 1000
  val MaxFileTotalBytes: Long = 512L * 1024 * 1024
  // vector_api.py:230,241,546
  val MaxQuestionBytes: Int = 1048576
  val MaxResults: Int = 1000
  val MaxRrfK: Int = 10000
}
