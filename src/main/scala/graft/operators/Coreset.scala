package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.{dotNative, l2NormNative}

/** Diversity-maximizing subset selection over an embedding column:
  * greedy k-center / farthest-point traversal (Gonzalez 1985, the
  * 2-approximation to the k-center objective) — the coreset-selection
  * step of a training-data pipeline ("cover the embedding space with k
  * representatives", the complement of SemDeDup's "collapse what's
  * close").
  *
  * Scale shape: k passes over the corpus, each a NARROW map (cosine
  * distance to the one newly chosen center, folded into a running min)
  * plus a 1-row argmax aggregate; no joins, no pair materialization,
  * driver state = k centers. The running-min column means round r costs
  * one distance evaluation per row, not r — the standard trick that
  * makes farthest-point linear in k·N. localCheckpoint per round keeps
  * the lineage flat (without it round r re-evaluates all previous
  * rounds' distance maps).
  */
object Coreset {

  /** The k chosen centers in selection order: (rank, id, sel_dist) where
    * sel_dist is the candidate's min cosine distance to the already-
    * chosen set at the moment of selection (the k-center coverage radius
    * sequence, non-increasing) — -1.0 for the seed, which is chosen as
    * the smallest id to keep the traversal deterministic.
    */
  def kCenter(vectors: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = vectors.sparkSession
    import spark.implicits._
    var cur = vectors
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("norm", l2NormNative(col("v")))
      .withColumn("md", lit(Double.MaxValue))
      .localCheckpoint()
    val seed = cur.orderBy("id").select("id", "v", "norm").head()
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Double)](
      (seed.getLong(0), -1.0))
    var lastVec = seed.getSeq[Float](1)
    var lastNorm = seed.getDouble(2)
    var r = 1
    while (r < k) {
      // fold the newly chosen center into the running min — one distance
      // per row per round
      cur = cur
        .withColumn("md", least(col("md"),
          lit(1.0) - dotNative(col("v"), typedLit(lastVec)) /
            (col("norm") * lit(lastNorm))))
        .localCheckpoint()
      val ids = chosen.map(_._1).toSeq
      val next = cur.filter(!col("id").isin(ids: _*))
        .orderBy(col("md").desc, col("id").asc)
        .select("id", "v", "norm", "md")
        .head()
      chosen += ((next.getLong(0), next.getDouble(3)))
      lastVec = next.getSeq[Float](1)
      lastNorm = next.getDouble(2)
      r += 1
    }
    chosen.toSeq.zipWithIndex
      .map { case ((id, d), i) => (i + 1, id, d) }
      .toDF("rank", "id", "sel_dist")
  }
}
