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

final class Retriever(api: Api, collection: String) {

  def initializeCollection(overwrite: Boolean = false): Unit =
    api.createCollection(collection, overwrite = overwrite)

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
