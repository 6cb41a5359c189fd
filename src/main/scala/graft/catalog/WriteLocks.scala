package graft.catalog

import java.util.concurrent.ConcurrentHashMap

/** Per-warehouse write monitors. Every mutator of a warehouse's tables and
  * derived indexes — Api write paths AND streaming compaction — must
  * synchronize on the SAME object, or two writers race the bucket-swap
  * MERGE / index-partition swaps (one deletes a live dir while the other
  * is mid-move, or both stage into the same .delta dir). Keyed by the
  * canonical warehouse path so two handles over one warehouse share a
  * monitor; JVM-local, like the reference's per-process RLock
  * (vector_api.py:202) — cross-process coordination is storage-layer
  * territory (a lock service or transactional table format), out of scope
  * for the engine.
  */
object WriteLocks {
  private val locks = new ConcurrentHashMap[String, Object]()

  def forWarehouse(warehouseDir: String): Object = {
    val key =
      try java.nio.file.Paths.get(warehouseDir).toAbsolutePath.normalize.toString
      catch { case _: Exception => warehouseDir }
    locks.computeIfAbsent(key, _ => new Object)
  }
}
