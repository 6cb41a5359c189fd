package graft.search

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.VectorFunctions
import graft.model.CollectionEntry

/** Chunk-level IVF — the PLAID-shape candidate index for late-interaction
  * serving (Santhanam et al., "PLAID: An Efficient Engine for Late
  * Interaction Retrieval", arXiv:2205.09707: ColBERTv2 serving routes
  * candidate generation through an IVF over the TOKEN/chunk embeddings
  * themselves). Every chunk vector of the persisted [[ChunkIndex]] is
  * assigned to the collection's IVF centroids (ONE quantizer for the
  * whole collection — the same centroid table the doc-level index and PQ
  * codes key on) and stored PARTITIONED BY cluster, so per-token
  * candidate generation probes the nearest clusters and scans only those
  * partitions' chunk rows.
  *
  * Why this exists next to the doc-level route
  * ([[ChunkIndex.searchAnn]]): a pooled document vector AVERAGES a
  * multi-topic document's directions away — the exact failure mode
  * maxsim is built to fix — so doc-level candidates systematically miss
  * the documents where maxsim most disagrees with single-vector scoring.
  * Chunk-level candidates come from the SAME vectors the rescore sums,
  * so the only recall loss is IVF quantization (`q_search_maxsim_civf`
  * grades it against exact truth alongside the doc-level route's
  * `q_search_maxsim_ann`).
  *
  * Row layout: (id = "<doc_id>#<chunk_idx>", embedding = the normalized
  * chunk vector, norm, cluster_id), partitioned by cluster_id — exactly
  * the frame shape [[graft.ann.Ann.ivfTopKBatchAdaptive]] serves from,
  * with the doc id recoverable by splitting the row key (document ids
  * are uuid-hex, '#'-free by construction). Maintenance is the standard
  * two-phase partition rebuild ([[graft.Indexes]]): a write touching Δ
  * documents rewrites only the clusters their old and new chunk vectors
  * inhabit — O(Δ × cluster) work at any corpus size. Rebuilding the
  * doc-level IVF (new centroids) re-assigns this index too
  * ([[graft.Api.buildAnnIndex]]), keeping the one-quantizer invariant.
  */
object ChunkIvfIndex {

  def indexPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".chunkvecs.ivf"

  /** A usable index = the dir AND its write job's _SUCCESS marker: a
    * crash mid-build (including the re-assign inside
    * [[graft.Api.buildAnnIndex]], where the NEW centroids are already
    * persisted) must read as index-absent — auto routing then falls back
    * to the doc-level/chunk routes and maintenance skips — never as a
    * partial or wrong-quantizer index served silently.
    */
  def exists(catalog: Catalog, entry: CollectionEntry): Boolean =
    Files.exists(Paths.get(indexPath(catalog, entry))) &&
      Files.exists(Paths.get(indexPath(catalog, entry), "_SUCCESS"))

  /** Invalidate the persisted index AHEAD of a parent-artifact rewrite
    * (chunk index re-chunk, IVF quantizer rebuild). [[exists]] demands the
    * `_SUCCESS` marker, so dropping just the marker makes every crash
    * window between the parent's commit and this index's rebuild read as
    * index-absent — auto routing falls back, maintenance skips — instead
    * of silently serving (and desyncing) an index keyed to the OLD
    * chunking/quantizer. The caller rebuilds via [[build]] afterwards,
    * which drops and rewrites the whole dir anyway.
    */
  def invalidate(catalog: Catalog, entry: CollectionEntry): Unit =
    Files.deleteIfExists(Paths.get(indexPath(catalog, entry), "_SUCCESS"))

  /** Index rows for chunk-index rows (id, chunk_idx, vec):
    * (id = doc#chunk, doc-recoverable, embedding, norm, cluster_id).
    */
  def indexRows(chunkRows: DataFrame, centroids: DataFrame): DataFrame =
    graft.ann.Ann.assign(
      chunkRows.select(
        concat(col("id"), lit("#"), col("chunk_idx")).as("id"),
        col("vec").as("embedding"))
        .withColumn("norm", VectorFunctions.l2Norm(col("embedding"))),
      centroids)

  /** Build (or rebuild) from the persisted chunk index + the
    * collection's IVF centroids (both must exist — governed at the Api).
    */
  def build(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): DataFrame = {
    // drop the old index first: every crash window then reads as
    // index-absent (exists() also demands _SUCCESS), never as a stale
    // index keyed to the previous quantizer or chunking
    graft.catalog.PartitionedTable.deleteDir(
      Paths.get(indexPath(catalog, entry)))
    val rows = indexRows(
      ChunkIndex.load(spark, catalog, entry),
      graft.ann.IvfIndex.loadCentroids(spark, catalog, entry))
    rows
      .repartition(col("cluster_id"))
      .sortWithinPartitions("id")
      .write.partitionBy("cluster_id")
      .mode(SaveMode.Overwrite)
      .parquet(indexPath(catalog, entry))
    load(spark, catalog, entry)
  }

  private val IndexSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", StringType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("norm", DoubleType),
      StructField("cluster_id", LongType)))
  }

  def load(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): DataFrame =
    spark.read.schema(IndexSchema).parquet(indexPath(catalog, entry))

  /** The doc id a chunk-row key belongs to. */
  def docIdOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring_index(id, "#", 1)
}
