package graft.ingest

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.catalog.Catalog
import graft.model.CollectionEntry

/** Bloom-filter existence prefilter — the classic 100 TB incremental-
  * ingest trick: a compact sketch of the corpus's ids answers "definitely
  * new" without touching the corpus, so the exact existence join runs
  * only over the (tiny) possibly-existing slice of each batch. One corpus
  * pass builds the sketch (a few bits per id — ~1.2 GB for 10^9 ids at
  * 1% fpp, broadcastable); each batch then splits executor-side with a
  * closure-captured `mightContain`, no join, no shuffle.
  *
  * Correctness contract: Bloom filters have NO false negatives — a
  * "definitely new" verdict is exact, so skipping the existence check for
  * that slice never loses a duplicate. False positives only route a few
  * extra rows through the exact check (a left-semi join against the
  * bucket-pruned corpus), never change results. Determinism: the sketch's
  * bit-set is an OR over per-item hashes — insertion order and
  * partitioning cannot change it.
  */
object BloomGate {

  /** Build the id sketch over the corpus (one pass; `expectedItems` sizes
    * the bit array — overshoot is wasted memory, undershoot inflates fpp).
    */
  def build(corpus: DataFrame, idCol: String,
      expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    corpus.stat.bloomFilter(col(idCol).cast("string"), expectedItems, fpp)

  /** Split a batch against the sketch: (definitelyNew, possiblyExisting).
    * The predicate runs executor-side over the broadcast-captured sketch
    * (a scan-local filter — pushdown beneath it unaffected). A null id
    * routes to the possibly-existing phase (the exact join decides), never
    * NPEs the batch. Set `materialize` when the batch is an expensive
    * derived frame: both output frames filter the same flagged plan, so an
    * unmaterialized split evaluates the batch source twice.
    */
  def split(batch: DataFrame, idCol: String, bloom: BloomFilter,
      materialize: Boolean = false): (DataFrame, DataFrame) = {
    val contains = udf((id: String) => id == null || bloom.mightContain(id))
    val flagged0 = batch.withColumn("__maybe", contains(col(idCol).cast("string")))
    val flagged = if (materialize) flagged0.localCheckpoint() else flagged0
    (flagged.filter(!col("__maybe")).drop("__maybe"),
      flagged.filter(col("__maybe")).drop("__maybe"))
  }

  /** Two-phase existence filter: rows of `batch` whose id is NOT in
    * `corpus` — bloom prunes first, the exact left-anti join runs only
    * over the possibly-existing slice. Result is exactly
    * `batch EXCEPT-by-id corpus` (the bloom can only send extra rows to
    * the exact phase, never skip a real duplicate).
    */
  def notExisting(
      corpus: DataFrame, batch: DataFrame, idCol: String,
      bloom: BloomFilter, materialize: Boolean = false): DataFrame = {
    val (definitelyNew, possibly) = split(batch, idCol, bloom, materialize)
    definitelyNew.unionByName(
      possibly.join(corpus.select(col(idCol)), Seq(idCol), "left_anti"))
  }

  // --------------------------------------- persisted derived-index sidecar

  /** The sketch lives next to the table like every other derived index
    * (`.postings`, `.signlsh`, …) and is torn down with the collection.
    */
  def sketchPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".bloom"
  def metaPath(catalog: Catalog, entry: CollectionEntry): String =
    catalog.tablePath(entry) + ".bloom.meta"

  /** Sizing parameters, persisted so per-batch refresh sketches are built
    * bit-compatible with the stored one (mergeInPlace requires identical
    * numBits + hash count, both derived from (expectedItems, fpp)).
    */
  final case class Meta(expectedItems: Long, fpp: Double)

  /** Build the sketch over the collection's current ids and persist it.
    * `expectedItems` defaults to 2x the current count (headroom so
    * incremental merges do not immediately inflate the fpp); the 1024
    * floor keeps tiny dev collections from degenerate sizing.
    */
  def buildIndex(
      spark: SparkSession, catalog: Catalog, entry: CollectionEntry,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): Long = {
    val ids = catalog.readDocuments(entry).select(col("id"))
    val n = ids.count()
    val expected = expectedItems.getOrElse(math.max(1024L, 2L * n))
    val bloom = ids.stat.bloomFilter(col("id"), expected, fpp)
    writeSketch(catalog, entry, bloom, Meta(expected, fpp))
    n
  }

  /** Load the persisted sketch, or None when the collection has no bloom
    * sidecar (callers fall back to the exact existence check).
    */
  def loadIndex(catalog: Catalog, entry: CollectionEntry): Option[BloomFilter] = {
    val p = Paths.get(sketchPath(catalog, entry))
    if (!Files.exists(p)) return None
    val in = Files.newInputStream(p)
    try Some(BloomFilter.readFrom(in))
    catch { case _: Exception => None } // unreadable sketch = no gate
    finally in.close()
  }

  /** O(batch) post-write maintenance: fold the batch's ids into the
    * persisted sketch (a batch-sized distributed bloom build with the
    * stored sizing, then a constant-size bitwise OR + rewrite). Ids only
    * accumulate — a bloom cannot unlearn — so deletes need no call here:
    * stale bits can only route extra rows to the exact check, never skip
    * a real duplicate. If the meta is unreadable the sketch is DELETED
    * (fail-safe: a sketch that can no longer be maintained must not serve,
    * or it would grow false NEGATIVES on later inserts).
    */
  def noteInserted(
      catalog: Catalog, entry: CollectionEntry, batch: DataFrame): Unit = {
    val sp = Paths.get(sketchPath(catalog, entry))
    if (!Files.exists(sp)) return
    (loadIndex(catalog, entry), readMeta(catalog, entry)) match {
      case (Some(bloom), Some(m)) =>
        val delta = batch.select(col("id"))
          .stat.bloomFilter(col("id"), m.expectedItems, m.fpp)
        bloom.mergeInPlace(delta)
        writeSketch(catalog, entry, bloom, m)
      case _ =>
        Files.deleteIfExists(sp)
        Files.deleteIfExists(Paths.get(metaPath(catalog, entry)))
    }
  }

  private def writeSketch(
      catalog: Catalog, entry: CollectionEntry,
      bloom: BloomFilter, meta: Meta): Unit = {
    val p = Paths.get(sketchPath(catalog, entry))
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(sketchPath(catalog, entry) + ".tmp")
    val out = Files.newOutputStream(tmp)
    try bloom.writeTo(out) finally out.close()
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING)
    Files.writeString(Paths.get(metaPath(catalog, entry)),
      s"""{"expectedItems": ${meta.expectedItems}, "fpp": ${meta.fpp}}""")
  }

  private def readMeta(catalog: Catalog, entry: CollectionEntry): Option[Meta] = {
    val p = Paths.get(metaPath(catalog, entry))
    if (!Files.exists(p)) return None
    try {
      val s = Files.readString(p)
      val items = """"expectedItems"\s*:\s*(\d+)""".r
        .findFirstMatchIn(s).map(_.group(1).toLong)
      val fpp = """"fpp"\s*:\s*([0-9.eE+-]+)""".r
        .findFirstMatchIn(s).map(_.group(1).toDouble)
      for (i <- items; f <- fpp) yield Meta(i, f)
    } catch { case _: Exception => None }
  }
}
