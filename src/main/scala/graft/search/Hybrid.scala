package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid search — weighted Reciprocal Rank Fusion of the semantic and
  * lexical result sets.
  *
  * Reference math (vector_mcp/vector_api.py:556-565): for each source with
  * weight w, a document at 1-based rank r contributes w / (rrf_k + r);
  * contributions are summed per document id (dedup across sources is
  * inherent), and the top `limit` documents by fused score are returned via
  * a bounded heap. Test: tests/test_vector_api.py:148-167.
  *
  * Spark-first: ranks are row_number() windows over each source's
  * (score desc, id asc) order; fusion is union -> groupBy(sum) ->
  * TakeOrderedAndProject. Both inputs are already top-k'd (<= limit rows per
  * query per source, limit <= 1000), so every step after the searches runs
  * on at most 2*limit rows per query — the heavy lifting stays in the
  * upstream corpus scans.
  */
object Hybrid {

  /** Fuse two ranked result sets. Inputs must have (query_idx, id, score).
    * Returns (query_idx, id, score) with score = fused RRF score,
    * top `limit` per query, ordered by score desc then id asc.
    *
    * Ranking shape: both inputs are already top-k'd, so each query's list
    * is <= limit (<= 1000) rows — small enough to rank as ONE aggregated
    * array per query (collect_list -> sort_array -> posexplode, the
    * reference's bounded heap as an aggregate). A row_number window would
    * compute the same ranks, but with a literal query_idx (the single-query
    * serving path) Catalyst folds the partition spec away and the window
    * degenerates to a global single-partition sort; the aggregate form
    * hash-spreads per-query groups across executors regardless of how
    * query_idx was built, and its state is bounded by limit per group.
    */
  def rrf(
      semantic: DataFrame,
      lexical: DataFrame,
      semanticWeight: Double,
      lexicalWeight: Double,
      rrfK: Int,
      limit: Int
  ): DataFrame = {
    // sort key struct(-score, id): ascending struct order = score desc,
    // ties id asc — the reference's (distance, id) rank order
    def ranked(df: DataFrame) = df
      .select("query_idx", "id", "score")
      .groupBy("query_idx")
      .agg(sort_array(collect_list(struct(negate(col("score")).as("ns"),
        col("id")))).as("ordered"))
      .select(col("query_idx"),
        posexplode(col("ordered")).as(Seq("rank0", "row")))
    def contrib(df: DataFrame, weight: Double): DataFrame =
      ranked(df).select(col("query_idx"), col("row.id").as("id"),
        (lit(weight) / (lit(rrfK.toDouble) +
          (col("rank0") + lit(1)).cast("double"))).as("contrib"))
    val fused = contrib(semantic, semanticWeight)
      .unionAll(contrib(lexical, lexicalWeight))
      .groupBy("query_idx", "id")
      .agg(sum("contrib").as("score"))
    ranked(fused)
      .filter(col("rank0") < limit)
      .select(col("query_idx"), col("row.id").as("id"),
        negate(col("row.ns")).as("score"))
      .orderBy(col("query_idx").asc, col("score").desc, col("id").asc)
  }

  /** Batched hybrid serving: fuse BOTH legs' multi-query batch paths in ONE
    * plan — [[Semantic.searchMany]] (one docs×queries pass with two-level
    * pre-top-k) and [[Lexical.searchBm25Many]] (one shared corpus-stats
    * aggregate for the union of all query terms). Q hybrid questions cost
    * one broadcast-join scan + (1 + Q) lexical scans instead of 2Q full
    * single-query plans; fusion math is [[rrf]] unchanged (it is already
    * query_idx-keyed).
    *
    * @param docs        (id, content, embedding, norm) corpus frame
    * @param queriesDf   (query_idx, query_vec) — the embedded questions
    * @param textQueries (query_idx, question) — the same questions as text
    */
  def rrfMany(
      docs: DataFrame,
      queriesDf: DataFrame,
      textQueries: Seq[(Int, String)],
      semanticWeight: Double,
      lexicalWeight: Double,
      rrfK: Int,
      limit: Int
  ): DataFrame = {
    val sem = Semantic.searchMany(docs, queriesDf, limit)
    val lex = Lexical.searchBm25Many(docs, textQueries, limit)
    rrf(sem, lex, semanticWeight, lexicalWeight, rrfK, limit)
  }
}
