package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.model.CollectionEntry

/** Derived-index maintenance shared by every write path (API upsert/delete
  * and streaming compaction).
  *
  * Reference parity: every backend maintains its indexes transactionally
  * with document writes (pg updates GIN/HNSW per INSERT, qdrant/mongo index
  * within upsert) — so any PERSISTED derived index here must reflect the
  * table after a write instead of silently serving stale rows. Postings are
  * rebuilt; IVF re-assigns against the persisted centroids (the quantizer
  * stays fixed, as in a production IVF — centroid retraining is an explicit
  * buildAnnIndex); sign-LSH re-bands under the same (bits, tables) derived
  * from the existing layout (the hyperplane family is a seeded constant,
  * so keys stay comparable).
  */
object Indexes {

  /** Refresh whichever persisted derived indexes exist for `entry`.
    * `dim` is the collection's embedding dimension (for LSH re-banding).
    */
  def refreshDerived(
      spark: SparkSession,
      catalog: Catalog,
      entry: CollectionEntry,
      dim: Int): Unit = {
    def exists(p: String) =
      java.nio.file.Files.exists(java.nio.file.Paths.get(p))
    if (exists(graft.search.LexIndex.indexPath(catalog, entry)))
      graft.search.LexIndex.build(spark, catalog, entry)
    if (exists(graft.ann.IvfIndex.centroidsPath(catalog, entry)) &&
        exists(graft.ann.IvfIndex.indexPath(catalog, entry)))
      graft.ann.IvfIndex.reassign(spark, catalog, entry)
    if (exists(graft.ann.SignLshIndex.indexPath(catalog, entry))) {
      // (bits, tables, seed) come from the persisted sidecar meta written at
      // build time — never derived from index rows, which go away when a
      // delete empties the collection (ADVICE r3). Legacy indexes without a
      // sidecar fall back to row-derivation once; build() then writes the
      // sidecar, making the parameters durable from that point on.
      val meta = graft.ann.SignLshIndex.metaOrDerive(spark, catalog, entry, dim)
      meta.foreach { m =>
        graft.ann.SignLshIndex.build(spark, catalog, entry, m.dim,
          bits = m.bits, tables = m.tables, seed = m.seed)
      }
    }
  }
}
