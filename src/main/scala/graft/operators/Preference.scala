package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Preference-pair (RLHF / DPO) dataset audits — the post-SFT sibling of
  * the [[Chat]] family. Two defects dominate real preference corpora and
  * both are cheap, corpus-scale aggregations:
  *
  *  - LENGTH BIAS: if `chosen` is systematically longer than `rejected`,
  *    a DPO/reward model trains a length preference instead of a quality
  *    preference (the well-documented verbosity bias of RLHF reward
  *    models). [[lengthBiasReport]] measures it per source in exact
  *    integer ppm/micro units so thresholds are reproducible.
  *  - DUPLICATED RESPONSES: many pairs sharing one identical `chosen`
  *    text (template answers, scraped boilerplate, reward hacking)
  *    overweight that response; [[duplicateResponses]] surfaces every
  *    such group content-addressed.
  *
  * Scale shape: one combiner-collapsed keyed aggregate each — the report
  * is source-count-sized, the dup table is dup-group-sized; token counts
  * are a narrow per-row expression. No windows, no joins, no UDFs.
  */
object Preference {

  /** Per-source audit over (sourceCol, chosenCol, rejectedCol):
    * (source, n_pairs, chosen_longer_ppm, len_delta_sum, identical_ppm)
    * — token-count comparison, exact integer arithmetic. The delta is
    * reported as a SUM (not a mean): a mean would divide a possibly
    * negative total, where Spark's `div` truncates toward zero but SQL
    * `//` floors — the sum keeps the audit engine-exact.
    */
  def lengthBiasReport(
      pairs: DataFrame, sourceCol: String, chosenCol: String,
      rejectedCol: String): DataFrame = {
    val lc = size(TextFunctions.tokens(col(chosenCol))).cast("long")
    val lr = size(TextFunctions.tokens(col(rejectedCol))).cast("long")
    pairs
      .select(col(sourceCol).as("source"), lc.as("__lc"), lr.as("__lr"),
        (col(chosenCol) === col(rejectedCol)).cast("long").as("__same"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum((col("__lc") > col("__lr")).cast("long")).as("__longer"),
        sum(col("__lc") - col("__lr")).as("__delta"),
        sum(col("__same")).as("__identical"))
      .select(col("source"), col("n_pairs"),
        expr("__longer * 1000000 div n_pairs").as("chosen_longer_ppm"),
        col("__delta").as("len_delta_sum"),
        expr("__identical * 1000000 div n_pairs").as("identical_ppm"))
  }

  /** Build DPO preference pairs from K-ranked response sets — the
    * producer side of the audits above. Input: one row per candidate
    * response (promptCol, respIdCol, respCol, scoreCol — a reward-model
    * score or human rank, higher preferred). Output: one row per pair
    * (prompt_id, chosen_id, rejected_id, chosen, rejected, margin) with
    * margin = chosen score − rejected score > 0 (ties never pair — a
    * tie carries no preference signal).
    *
    *  - `bestVsRest = true` (default): the top-scored response (ties
    *    break on id asc, deterministic) against every strictly-lower
    *    response — K−1 pairs per prompt, the standard DPO construction.
    *  - `bestVsRest = false`: ALL ordered pairs with a positive margin —
    *    up to K·(K−1)/2 per prompt, the listwise-to-pairwise expansion.
    *
    * Content-addressed hygiene built in: pairs whose chosen and rejected
    * TEXTS are identical (sha256) are dropped — a model can't learn a
    * preference between equal strings, and such pairs are exactly what
    * [[lengthBiasReport]]'s `identical_ppm` and [[duplicateResponses]]
    * flag downstream.
    *
    * Scale shape: everything is prompt-keyed — one window (best) or one
    * self-join (all pairs) per prompt group, per-key state bounded by K
    * (a response-set constant, never corpus-sized).
    */
  def buildPairs(
      responses: DataFrame,
      promptCol: String,
      respIdCol: String,
      respCol: String,
      scoreCol: String,
      bestVsRest: Boolean = true): DataFrame = {
    val base = responses.select(
      col(promptCol).as("prompt_id"), col(respIdCol).as("resp_id"),
      col(respCol).as("resp"), col(scoreCol).as("sc"))
    val winners =
      if (bestVsRest) {
        val byPrompt = Window.partitionBy("prompt_id")
          .orderBy(col("sc").desc, col("resp_id").asc)
        base.withColumn("__rn", row_number().over(byPrompt))
          .filter(col("__rn") === 1).drop("__rn")
      } else base
    winners
      .select(col("prompt_id"), col("resp_id").as("chosen_id"),
        col("resp").as("chosen"), col("sc").as("__csc"))
      .join(base.select(col("prompt_id"), col("resp_id").as("rejected_id"),
        col("resp").as("rejected"), col("sc").as("__rsc")), Seq("prompt_id"))
      .filter(col("__csc") > col("__rsc"))
      .filter(sha2(col("chosen"), 256) =!= sha2(col("rejected"), 256))
      .select(col("prompt_id"), col("chosen_id"), col("rejected_id"),
        col("chosen"), col("rejected"), (col("__csc") - col("__rsc")).as("margin"))
  }

  /** Groups of pairs sharing an IDENTICAL chosen response: one row per
    * duplicated response — (resp_sha, n_pairs, first_pair_id) — for
    * groups of size >= minPairs. Content-addressed (sha256), so the
    * audit composes with snapshot diffs and exact dedup.
    */
  def duplicateResponses(
      pairs: DataFrame, idCol: String, chosenCol: String,
      minPairs: Long = 2L): DataFrame = {
    require(minPairs >= 2, s"minPairs >= 2, got $minPairs")
    pairs
      .select(col(idCol).as("pair_id"), sha2(col(chosenCol), 256).as("resp_sha"))
      .groupBy("resp_sha")
      .agg(count(lit(1)).as("n_pairs"), min(col("pair_id")).as("first_pair_id"))
      .filter(col("n_pairs") >= minPairs)
  }
}
