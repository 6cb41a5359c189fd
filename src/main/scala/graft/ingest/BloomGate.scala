package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

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
}
