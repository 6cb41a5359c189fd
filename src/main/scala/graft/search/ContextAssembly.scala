package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAG context assembly — the serving step after retrieval (and optional
  * [[Mmr]] re-ranking): fit the ranked shortlist into the generator's
  * context-token budget. Greedy prefix semantics: results are taken in
  * rank order (score DESC, id ASC) while the running token sum stays
  * within the budget; the first overflowing result cuts the context (no
  * skip-and-continue — retrieval rank is trusted, and a mid-list skip
  * would reorder evidence the reranker placed deliberately).
  *
  * Scale shape: the window partitions by query_idx, so per-task work is
  * bounded by one query's shortlist (≤ the n_results guard, never the
  * corpus) and a batch of Q queries assembles in one plan — the same
  * batched-serving contract as `Semantic.searchMany`/`Hybrid.rrfMany`.
  */
object ContextAssembly {

  /** Input: (query_idx, id, score, tokens) ranked results; output: the
    * kept rows with (rank, cum_tokens) — rank in (score DESC, id ASC)
    * order, cum_tokens the inclusive running sum.
    */
  def assemble(results: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"need budgetTokens >= 1 (got $budgetTokens)")
    val byRank = Window.partitionBy("query_idx")
      .orderBy(col("score").desc, col("id").asc)
    results
      .withColumn("rank", row_number().over(byRank))
      .withColumn("cum_tokens",
        // null tokens would be SKIPPED by the window sum — the row would
        // keep its rank and pass the budget filter while consuming no
        // budget, silently overpacking the context; count it as 0 so the
        // row is still charged-for deterministically
        sum(coalesce(col("tokens"), lit(0L)))
          .over(byRank.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= budgetTokens)
  }
}
