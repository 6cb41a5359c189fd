package graft.operators

import org.apache.spark.sql.DataFrame
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
