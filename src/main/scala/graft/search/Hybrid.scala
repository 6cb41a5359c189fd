package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    */
  def rrf(
      semantic: DataFrame,
      lexical: DataFrame,
      semanticWeight: Double,
      lexicalWeight: Double,
      rrfK: Int,
      limit: Int
  ): DataFrame = {
    val w = Window.partitionBy("query_idx").orderBy(col("score").desc, col("id").asc)
    def contrib(df: DataFrame, weight: Double): DataFrame =
      df.select("query_idx", "id", "score")
        .withColumn("rank", row_number().over(w))
        .select(col("query_idx"), col("id"),
          (lit(weight) / (lit(rrfK.toDouble) + col("rank").cast("double"))).as("contrib"))
    val fused = contrib(semantic, semanticWeight)
      .unionAll(contrib(lexical, lexicalWeight))
      .groupBy("query_idx", "id")
      .agg(sum("contrib").as("score"))
    val topW = Window.partitionBy("query_idx").orderBy(col("score").desc, col("id").asc)
    fused
      .withColumn("rn", row_number().over(topW))
      .filter(col("rn") <= limit)
      .drop("rn")
      .orderBy(col("query_idx").asc, col("score").desc, col("id").asc)
  }
}
