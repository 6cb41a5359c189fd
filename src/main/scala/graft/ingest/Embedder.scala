package graft.ingest

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.model.{ErrorCodes, GraftException}

/** Batch embedding — the only inherently non-Catalyst step (an external
  * model call). Mirrors `document_embeddings`
  * (reference: vector_mcp/vectordb/base.py:34-75):
  *
  *  - supplied embeddings pass through untouched;
  *  - missing ones are produced in one batch call per PARTITION (the
  *    reference batches per ingest call, base.py:52-58; per-partition is the
  *    distributed equivalent — one model request per executor-partition);
  *  - validation: non-empty, dimension-consistent, all finite, else
  *    `embedding_invalid` / `embedding_batch_invalid`.
  */
trait Embedder extends Serializable {
  def dimension: Int
  /** One batched call: one vector per input text, in order. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  def embedQuery(text: String): Array[Float] = embedBatch(Seq(text)).head
}

/** Deterministic offline embedder — the engine-side port of the reference
  * test fixture (reference: tests/test_all_backends.py:44-64:
  * `emb[i] = (hash(text + str(i)) % 100) / 100.0`, query ≡ text).
  * Python's `hash()` is process-seeded, so per FIXTURES.md §3 the port
  * replaces it with a stable digest: first 8 bytes of sha256(text + i) as
  * an unsigned value, mod 100, / 100.0 — deterministic across JVMs and
  * reproducible in any oracle.
  */
final class DeterministicHashEmbedder(val dimension: Int = 768) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    // One digest instance per batch (digest() resets it), the text's UTF-8
    // bytes encoded once per TEXT instead of once per (text, dimension),
    // and the "first 15 hex chars as a long" read as what it is — the top
    // 60 bits of the big-endian first 8 digest bytes (an unsigned >>> 4)
    // — instead of 8 String.formats + parseLong per component. The old
    // form cost ~10 us per (text, dim): at 30k chunks x 8 dims per maxsim
    // fixture it was the dominant stage of every maxsim harness query.
    // Bit-identical output (EmbedderSpec pins vectors; oracle replays
    // sha256 per component).
    val md = MessageDigest.getInstance("SHA-256")
    texts.map { t =>
      val tBytes = t.getBytes("UTF-8")
      Array.tabulate(dimension) { i =>
        md.update(tBytes)
        md.update(String.valueOf(i).getBytes("UTF-8"))
        val d = md.digest()
        val v = ((d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
          (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
          (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
          (d(6) & 0xffL) << 8 | (d(7) & 0xffL)) >>> 4
        ((v % 100).toFloat) / 100.0f
      }
    }
  }
}

object Embed {

  /** Fill missing embeddings via one embedder call per partition; validate
    * everything (base.py:59-75 semantics). Input must have columns
    * (content: string, embedding: array<float> nullable); other columns
    * pass through.
    */
  def withEmbeddings(df: DataFrame, embedder: Embedder): DataFrame = {
    val schema = df.schema
    val embIdx = schema.fieldIndex("embedding")
    val contentIdx = schema.fieldIndex("content")
    val dim = embedder.dimension
    val out = df.queryExecution.toRdd.mapPartitions { rows =>
      // materialize the partition: collect missing texts for ONE batch call
      val internal = rows.map(_.copy()).toArray
      val missing = internal.zipWithIndex.filter { case (r, _) => r.isNullAt(embIdx) }
      val vectors: Map[Int, Array[Float]] =
        if (missing.isEmpty) Map.empty
        else {
          val texts = missing.map { case (r, _) => r.getUTF8String(contentIdx).toString }
          val got = embedder.embedBatch(texts.toSeq)
          if (got.length != missing.length)
            throw new GraftException(ErrorCodes.EmbeddingBatchInvalid)
          missing.map(_._2).zip(got).toMap
        }
      internal.iterator.zipWithIndex.map { case (r, i) =>
        val vec: Array[Float] = vectors.get(i) match {
          case Some(v) => v
          case None =>
            val arr = r.getArray(embIdx)
            Array.tabulate(arr.numElements())(j => arr.getFloat(j))
        }
        if (vec.isEmpty || vec.length != dim || vec.exists(v => v.isNaN || v.isInfinite))
          throw new GraftException(ErrorCodes.EmbeddingInvalid)
        val proj = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          schema.length)
        var j = 0
        while (j < schema.length) {
          if (j == embIdx)
            proj.update(j, org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vec))
          else proj.update(j, r.get(j, schema(j).dataType))
          j += 1
        }
        proj.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      }
    }
    val spark = df.sparkSession
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.map(f =>
        if (f.name == "embedding") f.copy(dataType = ArrayType(FloatType), nullable = false)
        else f))
    org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(spark, out, newSchema)
  }
}
