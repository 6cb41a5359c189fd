package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary-code (sign-bit) ANN with Hamming shortlisting — the cheapest
  * member of the quantized-index family: each embedding collapses to one
  * bit per dimension (bit i set iff x_i > 0), Hamming distance between
  * codes approximates angular distance (Charikar 2002 — the same
  * hyperplane-sign family as [[SignLshIndex]], but used as a LINEAR-scan
  * code distance instead of a bucketing key, so recall degrades smoothly
  * instead of cliff-ing at bucket edges), and an exact cosine re-rank
  * over the shortlist restores correctness w.r.t. the shortlist.
  *
  * Scale shape: the code map is narrow (no shuffle, stays in codegen —
  * bit shifts and ORs over a 64-step fold), the scan reads 8 bytes per
  * word per vector instead of d floats (32x narrower at d=64), and the
  * per-query top-(k·oversample) runs through the same two-level
  * bounded-window pattern every serving path here uses. Codes pack into
  * 32-bit halves carried as BIGINTs: portable to the SQL oracle (DuckDB
  * raises on a 1<<63 BIGINT shift) and generalizing to d > 64 by adding
  * words.
  */
object Hamming {

  /** Bits [lo, hi) of the sign pattern of array column `colName`, packed
    * little-endian into one BIGINT (bit j of the result = sign of dim
    * lo+j). SQL-expression form: the Scala `shiftleft` helper only
    * accepts a literal shift, the SQL function takes expressions.
    */
  private def word(colName: String, lo: Int, hi: Int): Column =
    expr(s"aggregate(sequence($lo, ${hi - 1}), 0L, (acc, i) -> " +
      s"acc | IF(element_at($colName, i + 1) > 0.0, shiftleft(1L, i - $lo), 0L))")

  /** (id, embedding, …) → (id, code_lo, code_hi) for d <= 64. */
  def codes(vectors: DataFrame, dim: Int): DataFrame = {
    require(dim > 32 && dim <= 64, s"two-word packing expects 32 < d <= 64, got $dim")
    vectors.select(col("id"),
      word("embedding", 0, 32).as("code_lo"),
      word("embedding", 32, dim).as("code_hi"))
  }

  /** Hamming-shortlisted exact-re-rank search, the [[Rp.searchRerank]] /
    * SQ8 serving shape: shortlist = top (k·oversample) per query by
    * (Hamming asc, id asc) over the codes-only scan, final k by exact
    * cosine over the shortlist rows only.
    */
  def searchRerank(
      vectors: DataFrame, // (id, embedding, norm)
      queries: Seq[(Int, Seq[Float])],
      dim: Int,
      k: Int,
      oversample: Int = 4): DataFrame = {
    require(k >= 1 && oversample >= 1, s"need k,oversample >= 1 (got $k, $oversample)")
    val spark = vectors.sparkSession
    import spark.implicits._
    val c = codes(vectors, dim)
    val qDf = queries.toDF("query_idx", "query_vec")
      .select(col("query_idx"), col("query_vec"),
        word("query_vec", 0, 32).as("q_lo"),
        word("query_vec", 32, dim).as("q_hi"))
    // one window, map-side group-limit pruned (see Ann.knnJoin)
    val globalW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_idx").orderBy(col("ham").asc, col("id").asc)
    val shortlist = c.join(broadcast(qDf))
      .withColumn("ham",
        bit_count(col("code_lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("code_hi").bitwiseXOR(col("q_hi"))))
      .withColumn("rn", row_number().over(globalW))
      .filter(col("rn") <= k * oversample)
      .select("query_idx", "id", "query_vec")
    shortlist
      .join(vectors.select(col("id"), col("embedding"), col("norm")), "id")
      .withColumn("score",
        graft.functions.VectorFunctions.dot(col("embedding"), col("query_vec")) /
          (col("norm") * graft.functions.VectorFunctions.l2Norm(col("query_vec"))))
      .withColumn("rrn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_idx")
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rrn") <= k)
      .select("query_idx", "id", "score")
  }
}
