package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-projection (Johnson–Lindenstrauss) dimensionality reduction for
  * embeddings — the classic 100 TB ANN preamble: project d-dim vectors to
  * t ≪ d dims with a sign matrix (Achlioptas 2003, "Database-friendly
  * random projections"), run candidate generation in the cheap projected
  * space, re-rank exactly in the original space. Pairwise inner products
  * are preserved within 1±ε for t = O(log n / ε²), so projected-space
  * top-k·oversample shortlists keep the true neighbors with high
  * probability — and the exact re-rank makes the final k correct w.r.t.
  * the shortlist regardless.
  *
  * Determinism: s_ij ∈ {+1, −1} derives from the md5 hash of
  * "rp:<seed>:<j>:<i>" (even → +1), so the matrix reproduces on any
  * cluster AND replays in a SQL oracle — no RNG state. The matrix is
  * t×d floats built driver-side (a few KB) and baked into the plan as a
  * literal; projection is a narrow map (no shuffle, no UDF — nested
  * transform/aggregate stays in codegen), with the left-fold summation
  * order the oracle mirrors exactly.
  */
object Rp {

  /** The sign in {+1.0, −1.0} for matrix cell (j = target dim, i = source
    * dim) — md5-derived, identical to the SQL replay
    * `('0x' || substr(md5('rp:seed:j:i'), 1, 8))::BIGINT % 2`.
    */
  def sign(seed: Long, j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp:$seed:$j:$i".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /** The t×d sign matrix as driver-side rows (row j = target dim j). */
  def matrix(seed: Long, targetDim: Int, dim: Int): Seq[Seq[Double]] =
    (0 until targetDim).map(j => (0 until dim).map(i => sign(seed, j, i)))

  /** Project an embedding column (ARRAY<FLOAT|DOUBLE>, length `dim`) to
    * `targetDim` doubles: y_j = Σ_i x_i · s_ij, summed in index order
    * (left fold — the order the oracle replays). No 1/√t scaling: every
    * consumer here ranks by cosine, which is scale-invariant.
    */
  def projectCol(emb: Column, seed: Long, targetDim: Int, dim: Int): Column = {
    val m = typedLit(matrix(seed, targetDim, dim))
    transform(sequence(lit(0), lit(targetDim - 1)), j =>
      aggregate(
        zip_with(emb.cast("array<double>"), element_at(m, j + 1), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x))
  }

  /** (id, embedding, norm) → (id, projected, pnorm): the low-dim frame
    * candidate generation runs over. Keep the original frame around for
    * the exact re-rank.
    */
  def project(vectors: DataFrame, seed: Long, targetDim: Int, dim: Int): DataFrame =
    vectors.select(col("id"),
      projectCol(col("embedding"), seed, targetDim, dim).as("projected"))
      .withColumn("pnorm",
        sqrt(aggregate(col("projected"), lit(0.0), (acc, x) => acc + x * x)))

  /** Projected-space ANN with exact original-space re-rank: shortlist =
    * top (k·oversample) by projected cosine per query, final k by exact
    * cosine over the shortlist only. Queries are (query_idx, full-dim
    * vector) literals — both spaces' query forms are derived in-plan.
    * Scale shape: one narrow projection map + a bounded-heap top-k over
    * t-dim vectors (the expensive d-dim dot products run only on
    * k·oversample rows per query).
    */
  def searchRerank(
      vectors: DataFrame, // (id, embedding, norm)
      queries: Seq[(Int, Seq[Float])],
      seed: Long,
      targetDim: Int,
      dim: Int,
      k: Int,
      oversample: Int = 4): DataFrame = {
    require(k >= 1 && oversample >= 1, s"need k,oversample >= 1 (got $k, $oversample)")
    val spark = vectors.sparkSession
    import spark.implicits._
    val projected = project(vectors, seed, targetDim, dim)
    val qDf = queries.toDF("query_idx", "query_vec")
      .withColumn("q_projected", projectCol(col("query_vec"), seed, targetDim, dim))
    // ONE window, pruned map-side: rn <= k*oversample on a row_number
    // window triggers InferWindowGroupLimit (SPARK-37099) — each map
    // partition emits at most that many rows per query BEFORE the
    // exchange, so no per-query window ever holds the corpus and the old
    // manual (query_idx, pid) pre-window's extra exchange + sort is gone
    val globalW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_idx").orderBy(col("psc").desc, col("id"))
    val shortlist = projected
      .join(broadcast(qDf))
      .withColumn("psc",
        aggregate(zip_with(col("projected"), col("q_projected"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x) /
          (col("pnorm") *
            sqrt(aggregate(col("q_projected"), lit(0.0), (acc, x) => acc + x * x))))
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
