package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe train/eval splitting — the data-split mistake near-dup
  * analysis exists to prevent: a random per-document split puts one copy
  * of a near-duplicate pair in train and the other in eval, and the eval
  * number silently measures memorization. This operator splits by
  * DUPLICATE CLUSTER: every document carries its component label
  * ([[graft.dedup.Dedup.duplicateClusters]] over any near-dup pair set —
  * MinHash, SimHash, embedding, …), and the side is decided by the
  * md5-derived hash of the COMPONENT, so an entire cluster lands on one
  * side, reproducibly, on any partitioning.
  *
  * Scale shape: component resolution is output-sized (the pair list);
  * the split itself is a broadcast join of the (id, comp) frame against
  * the corpus plus one hash — no extra shuffle beyond what the cluster
  * resolution already did.
  */
object Split {

  /** Assign each document a split: (id, comp, split) with split ∈
    * {"train", "eval"}; `evalPermille` of hash space (0–1000) goes to
    * eval. `docs` needs an `id` column; `pairs` is an (a, b) near-dup
    * pair frame over the same ids. Documents in no pair form their own
    * singleton component (comp = id).
    */
  def leakageSafeSplit(
      docs: DataFrame,
      pairs: DataFrame,
      evalPermille: Int): DataFrame = {
    require(evalPermille >= 0 && evalPermille <= 1000,
      s"evalPermille $evalPermille outside [0, 1000]")
    val comps = graft.dedup.Dedup.duplicateClusters(pairs)
    docs.select(col("id"))
      .join(comps, Seq("id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("id")))
      .withColumn("split",
        when(pmod(graft.functions.TextFunctions.stableHash32(
            col("comp").cast("string")), lit(1000L)) < evalPermille, lit("eval"))
          .otherwise(lit("train")))
  }
}
