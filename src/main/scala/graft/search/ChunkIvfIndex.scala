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
  * assigned to a quantizer and stored PARTITIONED BY cluster, so
  * per-token candidate generation probes the nearest clusters and scans
  * only those partitions' chunk rows.
  *
  * Two quantizer sources, chosen at build time:
  *   - doc-aligned (default): the collection's doc-level IVF centroids
  *     (ONE quantizer for the whole collection — the same centroid table
  *     the doc-level index and PQ codes key on; simplest maintenance
  *     invariant, but doc-vector centroids can quantize multi-topic
  *     chunk vectors poorly);
  *   - chunk-trained ([[buildChunkTrained]], `Api.buildChunkIvfIndex
  *     (trainOn = "chunks")`): k-means over the CHUNK vectors themselves
  *     — PLAID's actual recipe (arXiv:2205.09707 trains the IVF on the
  *     token embeddings it serves) — persisted in this index's OWN
  *     centroid sidecar ([[centroidsPath]]). A chunk-trained index is
  *     independent of the doc-level quantizer: rebuilding the doc IVF
  *     neither invalidates nor re-assigns it, and serving/maintenance
  *     read [[quantizer]] (own sidecar when present, doc centroids
  *     otherwise) so both layouts flow through identical machinery.
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

  /** The OWN centroid sidecar of a chunk-trained index ([[buildChunkTrained]]);
    * absent for doc-aligned indexes. Shares the table-path prefix, so
    * collection deletion's prefix sweep takes it with everything else.
    */
  def centroidsPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".chunkvecs.ivf.centroids"

  /** Chunk-trained quantizer present (dir + its write job's _SUCCESS). */
  def hasOwnCentroids(catalog: Catalog, entry: CollectionEntry): Boolean =
    Files.exists(Paths.get(centroidsPath(catalog, entry))) &&
      Files.exists(Paths.get(centroidsPath(catalog, entry), "_SUCCESS"))

  /** SOME quantizer is readable for this index: its own chunk-trained
    * sidecar, or the collection's doc-level IVF centroids.
    */
  def quantizerExists(catalog: Catalog, entry: CollectionEntry): Boolean =
    hasOwnCentroids(catalog, entry) ||
      Files.exists(Paths.get(graft.ann.IvfIndex.centroidsPath(catalog, entry)))

  /** The centroid table this index keys its partitions on: the own
    * chunk-trained sidecar when present, the doc-level IVF centroids
    * otherwise. Serving and write-path maintenance BOTH resolve through
    * here, so the two can never disagree on the quantizer.
    */
  def quantizer(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): DataFrame =
    if (hasOwnCentroids(catalog, entry))
      spark.read.parquet(centroidsPath(catalog, entry))
    else graft.ann.IvfIndex.loadCentroids(spark, catalog, entry)

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

  /** Build (or rebuild) from the persisted chunk index, PRESERVING the
    * current quantizer source ([[quantizer]]) — the re-derive entry the
    * parent rebuilds (re-chunk, doc-quantizer rebuild) call.
    */
  def build(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): DataFrame = {
    // drop the old index first: every crash window then reads as
    // index-absent (exists() also demands _SUCCESS), never as a stale
    // index keyed to the previous quantizer or chunking
    graft.catalog.PartitionedTable.deleteDir(
      Paths.get(indexPath(catalog, entry)))
    writeAssigned(spark, catalog, entry, quantizer(spark, catalog, entry))
  }

  /** Build doc-ALIGNED: key the index on the collection's doc-level IVF
    * centroids and DROP any chunk-trained sidecar (the explicit switch
    * back from a chunk-trained layout). Crash ordering: index dir first
    * (every window reads index-absent), then the sidecar — a crash
    * between the two leaves an orphaned sidecar and no index, which the
    * next build simply resolves through [[quantizer]].
    */
  def buildDocAligned(spark: SparkSession, catalog: Catalog, entry: CollectionEntry): DataFrame = {
    graft.catalog.PartitionedTable.deleteDir(
      Paths.get(indexPath(catalog, entry)))
    graft.catalog.PartitionedTable.deleteDir(
      Paths.get(centroidsPath(catalog, entry)))
    writeAssigned(spark, catalog, entry,
      graft.ann.IvfIndex.loadCentroids(spark, catalog, entry))
  }

  /** Build with a quantizer TRAINED ON THE CHUNK VECTORS themselves —
    * the PLAID recipe (arXiv:2205.09707): deterministic decimal-exact
    * Lloyd ([[graft.ann.Ann.kmeansCentroids]]) over the persisted chunk
    * rows (optionally a deterministic hash-of-key `trainFraction`
    * sample — the 100 TB training bound; ASSIGNMENT always covers every
    * chunk row). The centroids land in this index's own sidecar; from
    * then on the quantizer is FROZEN across writes and doc-IVF rebuilds
    * (what a production IVF does — retraining is an explicit rebuild
    * through here). Crash ordering: index dir is dropped first, so every
    * window below reads index-absent; an orphaned new-centroid sidecar
    * (crash between the centroid and index writes) is a valid trained
    * quantizer the next [[build]] picks up.
    */
  def buildChunkTrained(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      nClusters: Int,
      kmeansIters: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    require(nClusters >= 0, s"nClusters $nClusters out of range")
    require(trainFraction > 0 && trainFraction <= 1,
      s"trainFraction $trainFraction out of (0,1]")
    graft.catalog.PartitionedTable.deleteDir(
      Paths.get(indexPath(catalog, entry)))
    val chunks = ChunkIndex.load(spark, catalog, entry).select(
        concat(col("id"), lit("#"), col("chunk_idx")).as("id"),
        col("vec").as("embedding"))
      .withColumn("norm", VectorFunctions.l2Norm(col("embedding")))
    // nClusters = 0 sizes the quantizer to the corpus: ~sqrt(N) partitions
    // (the standard IVF sizing guidance, and the shape PLAID's ColBERTv2
    // index uses) with a floor of 16 — a parquet-metadata count, no scan
    val k =
      if (nClusters > 0) nClusters
      else math.max(16, math.ceil(math.sqrt(chunks.count().toDouble)).toInt)
    val train =
      if (trainFraction >= 1.0) chunks
      else graft.operators.Sampling.sample(chunks, "id", trainFraction)
    val cents = graft.ann.Ann.kmeansCentroids(train, k, kmeansIters)
    graft.catalog.PartitionedTable.deleteDir(
      Paths.get(centroidsPath(catalog, entry)))
    cents.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(centroidsPath(catalog, entry))
    writeAssigned(spark, catalog, entry,
      spark.read.parquet(centroidsPath(catalog, entry)))
  }

  private def writeAssigned(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      centroids: DataFrame): DataFrame = {
    // invalidate-first: drop the PREVIOUS build's health baseline before
    // the index lands, so a crash between the index write and the fresh
    // baseline below reads as baseline-missing (governed
    // ann_index_not_found from Api.indexHealth) — never as a valid new
    // index silently compared against the prior build's distribution
    graft.catalog.PartitionedTable.deleteDir(Paths.get(
      graft.ann.IndexHealth.chunkIvfBaselinePath(catalog, entry)))
    indexRows(ChunkIndex.load(spark, catalog, entry), centroids)
      .repartition(col("cluster_id"))
      .sortWithinPartitions("id")
      .write.partitionBy("cluster_id")
      .mode(SaveMode.Overwrite)
      .parquet(indexPath(catalog, entry))
    // every full (re)build re-baselines the drift probe's sidecar
    graft.ann.IndexHealth.writeBaseline(load(spark, catalog, entry), centroids,
      graft.ann.IndexHealth.chunkIvfBaselinePath(catalog, entry))
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
