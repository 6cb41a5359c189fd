package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Loaders adapting the driver's testdata layout (TESTDATA.md: parquet
  * tables under /root/testdata/sf0.001|0.01|0.1) to the engine's document
  * schema (FIXTURES.md section 1).
  */
object Tables {

  /** Spread an under-parallelized read to the session's parallelism.
    *
    * The driver's testdata tables are single parquet files, and splits
    * align to row groups — so every table here reads as ONE partition and
    * all narrow work upstream of a query's first exchange (shingling,
    * fingerprints, quality signals, scoring) would run in a single task
    * (measured: MinHash near-dups 5.2 s -> 2.0 s at sf0.1 x 32 cores from
    * this alone). The n-row round-robin shuffle is noise next to the work
    * it parallelizes; at deployment scale scans are already wide and this
    * is a no-op. Results are unaffected — every operator is
    * partitioning-invariant by contract (the ScaleProbe invariant), and
    * filter/column pushdown still reaches the scan below the exchange.
    */
  def spread(df: DataFrame): DataFrame =
    spreadBy(df, col("doc_id"))

  /** Keyed variant: hash-repartition by `key` instead of round-robin —
    * round-robin repartition LOCALLY SORTS every row first (Spark's
    * retry-determinism guard, sortBeforeRepartition), which on a fat text
    * column costs a visible constant per query; a deterministic hash key
    * needs no sort.
    */
  def spreadBy(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target, key)
  }

  /** Raw single-file read — the serving paths (semantic top-k is a plan
    * literal: scan -> score -> TakeOrdered, NO exchange) keep it so their
    * physical plans stay shuffle-free; heavy corpus operators read via
    * [[t]] and get [[spread]].
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** documents is the one table whose consumers do heavy NARROW work
    * (shingling, fingerprints, quality signals, media synth+decode) before
    * their first exchange — spreading it was measured −3 to −5 s on each
    * of the heavy dedup/text/graph entries. The other tables' queries are
    * join/window-dominated: they re-exchange immediately anyway, and a
    * blanket pre-exchange measured +0.5-1.3 s of pure added shuffle on a
    * third of the TPC-H/events surface. So: spread documents, leave the
    * rest at scan partitioning.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = raw(spark, dir, name)
    if (name == "documents") spread(df) else df
  }

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

  /** Embeddings-only view with engine column names. Raw read: the
    * serving queries over this frame assert exchange-free plans
    * (PlanSpec); operators that need parallel narrow work over it spread
    * internally (Ann.knnJoin) or explicitly.
    */
  def vectors(spark: SparkSession, dir: String): DataFrame =
    raw(spark, dir, "embeddings").select(
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
