package graft.retriever

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Api
import graft.functions.TextFunctions

/** The RAGRetriever protocol surface — the reference's second public API
  * (reference: vector_mcp/retriever/retriever.py:15-101; native impl
  * retriever/epistemic_graph_retriever.py:152-189).
  *
  * Result shape is {text, score, id, metadata} (a projection of the engine
  * SearchHit); `query` is semantic top-k, `bm25Query` is lexical. Chunking
  * (retriever ingest splits long documents into <=512-token chunks,
  * tests/reproduce_chunking.py:15-19) is a posexplode of the token-window
  * splitter at ingest.
  */
final case class RetrieverHit(text: String, score: Double, id: String,
    metadata: Map[String, String])

/** `documentRoot`: the confined root that directory / path inputs resolve
  * against (reference: the configured document directory every
  * `document_paths` entry must stay inside, document_inputs.py:19-147).
  * Retrievers constructed without one reject file inputs. A
  * caller-supplied `documentDirectory` narrows the scan to a
  * subdirectory INSIDE this root (real-path checked) — it never becomes
  * the confinement root itself. (Stricter than the reference retrievers,
  * which load any path the process can read; this engine routes every
  * file input through the same confinement the MCP surface enforces.)
  */
final class Retriever(api: Api, collection: String,
    documentRoot: Option[String] = None) {

  /** connect_database (retriever.py:66-75): in a Spark-native engine the
    * "connection" is the live session + readable catalog; the protocol
    * result is a Boolean, not an exception.
    */
  def connectDatabase(): Boolean =
    try { api.listCollections(); true } catch { case _: Exception => false }

  /** initialize_collection (retriever.py:24-51): create (default
    * overwrite=true, mirroring the protocol default) and ingest whichever
    * of the three input kinds were given. Boolean result per the protocol;
    * callers wanting governed error codes use the Api directly.
    */
  def initializeCollection(
      overwrite: Boolean = true,
      documentDirectory: Option[String] = None,
      documentPaths: Seq[String] = Nil,
      documentContents: Seq[String] = Nil,
      maxTokensPerChunk: Int = 512): Boolean =
    try {
      api.createCollection(collection, overwrite = overwrite)
      if (documentDirectory.nonEmpty || documentPaths.nonEmpty ||
          documentContents.nonEmpty)
        addDocumentInputs(documentDirectory, documentPaths, documentContents,
          maxTokensPerChunk)
      true
    } catch { case _: Exception => false }

  /** add_documents over the protocol's three input kinds (directory /
    * path list / inline contents), root-confined exactly like the MCP
    * ingestion path. Returns number of stored chunks.
    */
  def addDocumentInputs(
      documentDirectory: Option[String] = None,
      documentPaths: Seq[String] = Nil,
      documentContents: Seq[String] = Nil,
      maxTokensPerChunk: Int = 512): Long = {
    val spark = api.spark
    // the CONFIGURED root is the only confinement boundary: a
    // caller-supplied documentDirectory narrows the scan to a
    // subdirectory inside it (real-path checked) and can never replace
    // it; retrievers constructed without a root reject file inputs. The
    // root is only consulted when a directory or path input needs it
    // (inline-only ingests resolve rootless, document_inputs.py:42-44)
    val resolved = graft.ingest.DocumentInputs.resolveDocumentInputs(
      configuredRoot = documentRoot.getOrElse(""),
      includeConfiguredDirectory = documentDirectory.nonEmpty,
      relativePaths = documentPaths,
      documentContents = documentContents,
      directoryWithinRoot = documentDirectory)
    val parts = Seq(
      // extension-routed (SimpleDirectoryReader analog): pdf/epub extract,
      // jsonl/html parse, everything else wholetext
      resolved.directory.map(d => graft.ingest.Loaders.loadDirectoryAuto(spark, d)),
      resolved.paths.map(ps => graft.ingest.Loaders.loadAuto(spark, ps)),
      if (documentContents.nonEmpty)
        Some(graft.ingest.Loaders.loadInline(spark, documentContents))
      else None).flatten
    require(parts.nonEmpty, "document input required")
    addDocuments(parts.reduce(_ unionByName _), maxTokensPerChunk)
  }

  /** Chunk + ingest documents; returns number of stored chunks. */
  def addDocuments(docs: DataFrame, maxTokensPerChunk: Int = 512): Long =
    api.addDocuments(collection, Retriever.chunk(docs, maxTokensPerChunk))

  def query(question: String, topK: Int = 10): Seq[RetrieverHit] =
    api.semanticSearch(collection, Seq(question), topK).results
      .map(h => RetrieverHit(h.content, h.score, h.id, h.metadata))

  def bm25Query(question: String, topK: Int = 10): Seq[RetrieverHit] =
    api.lexicalSearchBm25(collection, Seq(question), topK).results
      .map(h => RetrieverHit(h.content, h.score, h.id, h.metadata))
}

object Retriever {

  /** Overlapping token-window chunking — the standard RAG splitter shape
    * (size/stride, overlap = size − stride) so a fact spanning a chunk
    * boundary still appears whole in some window. Window starts are
    * 0, stride, 2·stride, …; the window count is
    * 1 + ceil(max(0, n − size)/stride), so the LAST window is the first
    * to reach the document's end and no emitted window is fully contained
    * in its predecessor. One output row per (doc, chunk_idx); per-row
    * array work only — no shuffle, no UDF.
    */
  def chunkOverlap(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize (got stride=$stride size=$chunkSize)")
    docs
      .withColumn("__words", split(col("content"), "\\s+"))
      .withColumn("__n", size(col("__words")))
      .withColumn("__nchunks",
        expr(s"1 + CAST((greatest(__n - $chunkSize, 0) + $stride - 1) DIV $stride AS INT)"))
      .select(col("*"),
        posexplode(transform(sequence(lit(0), col("__nchunks") - 1),
          i => concat_ws(" ",
            slice(col("__words"), i * stride + 1, lit(chunkSize)))))
          .as(Seq("chunk_idx", "__chunk")))
      .filter(length(col("__chunk")) > 0)
      .withColumn("content", col("__chunk"))
      .drop("__words", "__n", "__nchunks", "__chunk")
  }

  /** Split content into <=maxTokens whitespace-token chunks, one output row
    * per chunk (documents under the limit pass through unchanged). Chunk
    * text rejoins the token window with single spaces — the standard
    * token-window splitter semantics.
    */
  def chunk(docs: DataFrame, maxTokens: Int): DataFrame = {
    docs
      .withColumn("__words", split(col("content"), "\\s+"))
      .withColumn("__chunks",
        transform(sequence(lit(0),
          greatest(ceil(size(col("__words")).cast("double") / maxTokens).cast("int"), lit(1)) - 1),
          i => concat_ws(" ", slice(col("__words"), i * maxTokens + 1, lit(maxTokens)))))
      .withColumn("content", explode(col("__chunks")))
      .filter(length(col("content")) > 0)
      .drop("__words", "__chunks")
  }
}
