package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.VectorFunctions
import graft.model.CollectionEntry

/** Persistent IVF index for a collection: the documents' vectors assigned
  * to deterministic centroids and written PARTITIONED BY cluster_id.
  *
  * This is the piece that makes ANN a *storage layout* rather than custom
  * Catalyst (SURVEY §7.3): at query time the probe filter
  * `cluster_id IN (...)` becomes physical partition pruning — on a 100 TB
  * collection with K clusters, an nprobe-probe query reads ~nprobe/K of
  * the data, and `.explain` shows it in PartitionFilters.
  *
  * Centroids are the embeddings of the K smallest doc ids (deterministic,
  * reproducible across builds — SURVEY §7.4 exactness note); swapping in
  * KMeans centroids changes recall, not the machinery.
  */
object IvfIndex {

  def indexPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".ivf"

  /** Build (or rebuild) the index from the collection's documents table. */
  def build(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      nClusters: Int): DataFrame = {
    val docs = catalog.readDocuments(entry)
      .select(col("id"), col("embedding"), col("norm"))
    val centroids = docs
      .orderBy("id").limit(nClusters)
      .select(monotonically_increasing_id().as("centroid_id"),
        col("embedding").as("centroid"), col("norm").as("centroid_norm"))
    val assigned = Ann.assign(docs, centroids)
    assigned.write
      .partitionBy("cluster_id")
      .mode(SaveMode.Overwrite)
      .parquet(indexPath(catalog, entry))
    centroids
  }

  /** Approximate top-k through the index: driver-side probe selection over
    * the (tiny, collected) centroid table, then a partition-pruned scan.
    */
  def search(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      centroids: DataFrame,
      queries: Seq[(Int, Seq[Float])],
      k: Int,
      nprobe: Int): DataFrame = {
    val assigned = spark.read.parquet(indexPath(catalog, entry))
    Ann.ivfTopK(assigned, centroids, queries, k, nprobe)
  }
}
