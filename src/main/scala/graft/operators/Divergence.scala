package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-slice token-distribution divergence — the domain-shift report a
  * mixed-source training corpus needs: how far each source/domain/shard's
  * unigram distribution sits from the corpus-wide one.
  *
  * KL(slice ‖ corpus) over the slice's OBSERVED token support, add-one
  * smoothed on both sides (the practical variant: the unobserved-token
  * remainder is a slice-constant that ranks slices identically; restricting
  * to the support keeps the computation keyed and the oracle exact).
  *
  * Scale shape: one tokenize+explode pass → per-(slice, token) counts and
  * per-token corpus counts (both combiner-collapsed keyed aggregates) →
  * one keyed join on token → per-slice sum. Nothing is ever vocab × slice
  * dense; driver state is two scalars (N, V).
  *
  * Numeric parity: each token's contribution is floored to integer
  * MICRO-nats before the per-slice sum, so the result is a BIGINT both
  * engines agree on bit-for-bit (the KN-perplexity convention — summing
  * raw doubles would drift by partial-aggregation order).
  */
object Divergence {

  /** KL divergence per slice. Input needs (sliceCol, tokens: array<string>).
    * Output: (slice, n_tokens, support, kl_micro) sorted by slice.
    */
  def klBySlice(docs: DataFrame, sliceCol: String): DataFrame = {
    val tok = docs.select(col(sliceCol).as("slice"), explode(col("tokens")).as("t"))
    val sliceTok = tok.groupBy("slice", "t").agg(count(lit(1)).as("c_st"))
    val corpusTok = tok.groupBy("t").agg(count(lit(1)).as("c_t")).localCheckpoint()
    // two scalars — metadata-sized driver state
    val totals = corpusTok.agg(
      sum("c_t").cast("long").as("n"), count(lit(1)).as("v")).collect()(0)
    val bigN = totals.getLong(0)
    val vocab = totals.getLong(1)
    val sliceTotals = sliceTok.groupBy("slice").agg(sum("c_st").as("n_s"))
    sliceTok
      .join(corpusTok, "t")
      .join(sliceTotals, "slice")
      .withColumn("term_micro",
        floor(lit(1e6)
          * ((col("c_st") + 1).cast("double") / (col("n_s") + lit(vocab)).cast("double"))
          * log(((col("c_st") + 1).cast("double") / (col("n_s") + lit(vocab)).cast("double"))
            / ((col("c_t") + 1).cast("double") / lit((bigN + vocab).toDouble)))))
      .groupBy("slice")
      .agg(max("n_s").cast("long").as("n_tokens"),
        count(lit(1)).as("support"),
        sum("term_micro").cast("long").as("kl_micro"))
      .orderBy("slice")
  }
}
