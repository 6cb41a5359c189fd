package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Loaders adapting the driver's testdata layout (TESTDATA.md: parquet
  * tables under /root/testdata/sf0.001|0.01|0.1) to the engine's document
  * schema (FIXTURES.md section 1).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The corpus as the engine sees it: documents joined 1:1 with their
    * embeddings (doc_id == vec_id in the driver's synthetic data), with the
    * precomputed L2 norm column the ingest path would normally add.
    * `id` is the join key column named per the engine schema.
    */
  def corpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val embs = t(spark, dir, "embeddings")
    docs
      .join(embs, docs("doc_id") === embs("vec_id"))
      .select(
        docs("doc_id").as("id"),
        docs("text").as("content"),
        embs("embedding"),
        VectorFunctions.l2Norm(embs("embedding")).as("norm"))
  }

  /** Text-only corpus (no embeddings join) — lexical operators run over ALL
    * documents; at some sf the embeddings table covers only a subset of
    * documents, so joining would silently shrink the lexical corpus.
    */
  def textCorpus(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("content"))

  /** Embeddings-only view with engine column names. */
  def vectors(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings").select(
      col("vec_id").as("id"),
      col("embedding"),
      col("label"),
      VectorFunctions.l2Norm(col("embedding")).as("norm"))

  /** Fetch specific stored embeddings to use as query vectors (driver-side;
    * a handful of rows — this is query preparation, not data processing).
    */
  def queryVectors(spark: SparkSession, dir: String, ids: Seq[Int]): Seq[(Int, Seq[Float])] = {
    val rows = t(spark, dir, "embeddings")
      .filter(col("vec_id").isin(ids.map(_.asInstanceOf[Any]): _*))
      .select("vec_id", "embedding")
      .collect()
    val m = rows.map(r => r.getLong(0).toInt -> r.getSeq[Float](1)).toMap
    ids.map(i => i -> m(i))
  }
}
