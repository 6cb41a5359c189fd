package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.{Catalog, PartitionedTable}
import graft.functions.VectorFunctions
import graft.model.CollectionEntry

/** Persistent kNN-graph index — the adjacency table [[GraphSearch]] serves
  * beam-search queries from, stored id-hash-bucket-partitioned like every
  * other derived index (README "persistent indexes are write-consistent
  * and INCREMENTALLY maintained").
  *
  * Unlike the rest of the index family, graph edges are NOT row-local: a
  * node's adjacency depends on every other row, so this index cannot ride
  * the generic stage/applyPending delta (which rebuilds affected
  * partitions from their own surviving rows). It instead maintains itself
  * EXACTLY with one Δ×corpus scoring pass per write:
  *
  *  - [[upsert]]: (1) the batch's own top-k comes from scoring batch ×
  *    corpus (one corpus scan, batch broadcast); (2) an EXISTING node's
  *    top-k can only change by admitting a batch vector, and cosine is
  *    symmetric — so the same scored pass, read in the other direction,
  *    finds every affected node (its current k-th score < its best batch
  *    score) and the merge of (current edges ∪ batch candidates) re-ranked
  *    to k is bit-identical to a full rebuild. O(|batch| × corpus) dots,
  *    bucket-pruned rewrites.
  *  - [[delete]]: removal only shrinks candidate sets, so the only nodes
  *    whose lists change are those that LOST an edge; they recompute
  *    against the surviving corpus (affected × corpus), everyone else's
  *    rows are untouched. Affected discovery scans the narrow index, not
  *    the corpus (at deployment scale a neighbor-bucketed reverse sidecar
  *    prunes even that — same trade as LexIndex's term buckets).
  *
  * Both paths are proven row-identical to `build` by GraphIndexSpec.
  * Graph construction here is the exact [[Ann.knnJoin]]; NN-descent or
  * blocked-kNN drop in for approximate builds at corpus scale — the
  * maintenance algebra above only needs "top-k among candidates" and is
  * exact relative to whichever graph it maintains.
  */
object GraphIndex {

  def indexPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".knng"

  def metaPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".knng.meta"

  /** (k, buckets) persist in a sidecar at build time — index parameters
    * are index STATE, never derived from rows (a delete that empties the
    * collection must not forget them; same rule as SignLshIndex).
    */
  final case class GraphMeta(k: Int, buckets: Int)

  def loadMeta(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): Option[GraphMeta] =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(metaPath(catalog, entry)))) None
    else spark.read.parquet(metaPath(catalog, entry)).collect().headOption
      .map(r => GraphMeta(r.getAs[Int]("k"), r.getAs[Int]("buckets")))

  val DefaultBuckets = 64

  private def bucketOf(id: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(id.cast("string")), lit(buckets.toLong)).cast("int")

  private def vectorsOf(catalog: Catalog, entry: CollectionEntry): DataFrame =
    catalog.readDocuments(entry).select(col("id"), col("embedding"), col("norm"))

  /** Build (or rebuild) the full adjacency: exact k-NN per node, written
    * partitioned by the qid's hash bucket.
    */
  def build(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      k: Int,
      buckets: Int = DefaultBuckets): Unit = {
    val adj = Ann.knnJoin(vectorsOf(catalog, entry), k)
      .withColumn("bucket", bucketOf(col("qid"), buckets))
    adj.repartition(col("bucket")).sortWithinPartitions("qid", "rank")
      .write.partitionBy("bucket").mode(SaveMode.Overwrite)
      .parquet(indexPath(catalog, entry))
    import spark.implicits._
    Seq((k, buckets)).toDF("k", "buckets")
      .write.mode(SaveMode.Overwrite).parquet(metaPath(catalog, entry))
  }

  def load(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): DataFrame =
    spark.read.parquet(indexPath(catalog, entry))

  /** Beam-search the persisted graph (see [[GraphSearch.beamSearch]]). */
  def search(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      queries: Seq[(Int, Seq[Float])],
      entries: Int = 4,
      beam: Int = 8,
      hops: Int = 3,
      k: Int = 5): DataFrame =
    GraphSearch.beamSearch(
      load(spark, catalog, entry).select("qid", "neighbor"),
      vectorsOf(catalog, entry), queries, entries, beam, hops, k)

  /** Exact incremental maintenance after a batch of `batchIds` was
    * UPSERTED into the documents table (new or replaced vectors; replaced
    * ids must have gone through [[delete]] first if their vectors changed
    * — the write path calls delete-then-upsert for updates).
    */
  def upsert(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      batchIds: Seq[String],
      k: Int,
      buckets: Int = DefaultBuckets): Unit = {
    if (batchIds.isEmpty) return
    val corpus = vectorsOf(catalog, entry).localCheckpoint()
    val batch = broadcast(
      corpus.filter(col("id").isin(batchIds: _*))
        .select(col("id").as("bid"), col("embedding").as("bv"), col("norm").as("bn"))
        .localCheckpoint())
    // ONE corpus scan scores every (corpus row, batch row) pair
    val scored = corpus.crossJoin(batch)
      .filter(col("id") =!= col("bid"))
      .withColumn("score",
        VectorFunctions.dot(col("bv"), col("embedding")) / (col("bn") * col("norm")))
      .select("id", "bid", "score")
      .localCheckpoint()

    // (1) batch nodes' own adjacency: top-k of batch × corpus
    val wBatch = Window.partitionBy("bid").orderBy(col("score").desc, col("id").asc)
    val batchAdj = scored
      .withColumn("rank", row_number().over(wBatch)).filter(col("rank") <= k)
      .select(col("bid").as("qid"), col("id").as("neighbor"), col("rank"), col("score"))

    // (2) existing nodes that must admit a batch edge: current k-th score
    //     (or missing, for under-filled lists) < best batch score
    val idx = load(spark, catalog, entry)
      .filter(!col("qid").isin(batchIds: _*)).localCheckpoint()
    val kth = idx.groupBy("qid")
      .agg(min(when(col("rank") === k, col("score"))).as("kth"))
    val bestBatch = scored.filter(!col("id").isin(batchIds: _*))
      .groupBy(col("id").as("qid")).agg(max("score").as("best"))
    // >= not >: an exact score TIE (identical vectors are common — replica
    // corpora, dedup fixtures) can still admit the batch edge via the
    // id-asc tie-break. Over-marking is safe (the merge re-rank computes
    // the exact answer); under-marking would diverge from a rebuild.
    val affectedIds = bestBatch.join(kth, Seq("qid"), "left")
      .filter(col("kth").isNull || col("best") >= col("kth"))
      .select("qid").localCheckpoint()

    // merge current edges with batch candidates, re-rank to k
    val wQ = Window.partitionBy("qid").orderBy(col("score").desc, col("neighbor").asc)
    val merged = idx.join(affectedIds, "qid").select("qid", "neighbor", "score")
      .unionByName(scored
        .join(affectedIds.withColumnRenamed("qid", "id"), "id")
        .select(col("id").as("qid"), col("bid").as("neighbor"), col("score")))
      // a (qid, batch-neighbor) edge can already be in idx when a write
      // path ran delete() first (its recompute saw the post-write corpus)
      // — a duplicate edge would displace a true one from the top-k
      .dropDuplicates("qid", "neighbor")
      .withColumn("rank", row_number().over(wQ)).filter(col("rank") <= k)
      .select("qid", "neighbor", "rank", "score")

    val touched = batch.select(col("bid").as("qid"))
      .unionByName(affectedIds).distinct()
      .select(bucketOf(col("qid"), buckets).as("bucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    val untouchedRows = idx
      .join(affectedIds, Seq("qid"), "left_anti")
      .withColumn("bucket", bucketOf(col("qid"), buckets))
      .filter(col("bucket").isin(touched.map(_.asInstanceOf[Any]): _*))
    val replacement = untouchedRows
      .unionByName(batchAdj.unionByName(merged)
        .withColumn("bucket", bucketOf(col("qid"), buckets)))
    PartitionedTable.replacePartitions(replacement, indexPath(catalog, entry),
      Seq("bucket"), sortCol = Some("qid"), affectedDirs = touched.map(b => s"bucket=$b"))
  }

  /** Exact incremental maintenance after `ids` were DELETED from the
    * documents table. Nodes that lost an edge recompute against the
    * surviving corpus; everyone else is untouched (deletion cannot improve
    * a candidate that was already losing).
    */
  def delete(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      ids: Seq[String],
      k: Int,
      buckets: Int = DefaultBuckets): Unit = {
    if (ids.isEmpty) return
    val idx = load(spark, catalog, entry).localCheckpoint()
    val affectedIds = idx
      .filter(col("neighbor").isin(ids: _*) && !col("qid").isin(ids: _*))
      .select("qid").distinct().localCheckpoint()
    val corpus = vectorsOf(catalog, entry).localCheckpoint() // post-delete
    val aff = broadcast(corpus
      .join(affectedIds.withColumnRenamed("qid", "id"), "id")
      .select(col("id").as("aid"), col("embedding").as("av"), col("norm").as("an")))
    val wA = Window.partitionBy("aid").orderBy(col("score").desc, col("id").asc)
    val recomputed = corpus.crossJoin(aff)
      .filter(col("id") =!= col("aid"))
      .withColumn("score",
        VectorFunctions.dot(col("av"), col("embedding")) / (col("an") * col("norm")))
      .withColumn("rank", row_number().over(wA)).filter(col("rank") <= k)
      .select(col("aid").as("qid"), col("id").as("neighbor"), col("rank"), col("score"))

    val idsDf = {
      import spark.implicits._
      ids.toDF("qid")
    }
    val touched = affectedIds
      .unionByName(idsDf)
      .select(bucketOf(col("qid"), buckets).as("bucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    val untouchedRows = idx
      .filter(!col("qid").isin(ids: _*))
      .join(affectedIds, Seq("qid"), "left_anti")
      .withColumn("bucket", bucketOf(col("qid"), buckets))
      .filter(col("bucket").isin(touched.map(_.asInstanceOf[Any]): _*))
    val replacement = untouchedRows
      .unionByName(recomputed.withColumn("bucket", bucketOf(col("qid"), buckets)))
    PartitionedTable.replacePartitions(replacement, indexPath(catalog, entry),
      Seq("bucket"), sortCol = Some("qid"), affectedDirs = touched.map(b => s"bucket=$b"))
  }
}
