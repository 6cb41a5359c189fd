package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Hard-negative mining — the contrastive-training data op (DPR, SBERT):
  * for each anchor, the top-k corpus vectors most similar to it that are
  * NEITHER the anchor itself NOR a known positive. Those are the
  * negatives that actually move a bi-encoder; random negatives are too
  * easy to carry gradient at scale.
  *
  * Scale shape: [[hardNegatives]] is the exact all-anchors×corpus form —
  * right for eval-sized anchor sets and as the oracle; its per-anchor
  * top-k uses the two-level (partition-local then global) window of
  * `Ann.knnJoin`, so no unbounded group ever sorts. [[hardNegativesBlocked]]
  * is the 100 TB path: both sides assign to the IVF quantizer and
  * candidates come only from the anchor's cluster — the same
  * cluster-keyed join (never all-pairs) as blocked kNN, trading the
  * cross-cluster tail of recall for corpus-scale linearity (the standard
  * ANN-mining tradeoff; recall envelope spec-measured).
  *
  * Exclusion semantics: positives are anti-joined BEFORE the top-k
  * window, so excluded rows never occupy a rank (mining k negatives
  * yields k negatives, not k minus however many positives scored high).
  */
object Mining {

  private def scoredCandidates(
      vectors: DataFrame, anchors: DataFrame, positives: DataFrame) = {
    val a = anchors.select(col("anchor_id"))
      .join(vectors.select(col("id").as("anchor_id"),
        col("embedding").as("qv"), col("norm").as("qn")), Seq("anchor_id"))
    val b = vectors.select(col("id"), col("embedding"), col("norm"))
    a.join(b, col("anchor_id") =!= col("id"))
      .join(positives.select(col("anchor_id"), col("pos_id").as("id")),
        Seq("anchor_id", "id"), "left_anti")
      .withColumn("score",
        VectorFunctions.dot(col("qv"), col("embedding")) /
          (col("qn") * col("norm")))
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    // one window, map-side group-limit pruned (see Ann.knnJoin)
    val globalW = Window.partitionBy("anchor_id")
      .orderBy(col("score").desc, col("id").asc)
    scored
      .select("anchor_id", "id", "score")
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select(col("anchor_id"), col("id").as("negative"), col("rank"),
        col("score"))
  }

  /** Exact form: every non-positive corpus vector is a candidate. */
  def hardNegatives(
      vectors: DataFrame,   // (id, embedding, norm)
      anchors: DataFrame,   // (anchor_id) — ids present in `vectors`
      positives: DataFrame, // (anchor_id, pos_id)
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1 (got $k)")
    topK(scoredCandidates(vectors, anchors, positives), k)
  }

  /** Deterministic RANDOM negatives — the uniform companion of
    * [[hardNegatives]] (the easy-negative mix every contrastive recipe
    * blends in): k pseudo-random non-positive, non-self ids per anchor,
    * reproducible across runs and partitionings.
    *
    * Scale shape: one bounded corpus pass selects a hash-ordered candidate
    * POOL (`TakeOrderedAndProject`, the [[Sampling.fixedSize]] shape);
    * per-anchor selection then runs against the broadcast pool — anchors ×
    * poolSize, never anchors × corpus. Randomness is the md5-derived
    * stableHash32 (the engine's cross-engine parity hash), keyed by seed
    * for the pool and by (anchor, candidate, seed) for per-anchor order,
    * so different anchors draw different negatives from the same pool.
    * poolSize must comfortably exceed k + the positives-per-anchor tail or
    * short anchors come back light.
    */
  def randomNegatives(
      vectors: DataFrame, anchors: DataFrame, positives: DataFrame,
      k: Int, poolSize: Int = 1024, seed: Int = 42): DataFrame = {
    require(k >= 1 && poolSize > k, s"need poolSize > k >= 1 (got k=$k pool=$poolSize)")
    val h = graft.functions.TextFunctions.stableHash32 _
    val pool = vectors
      .select(col("id"))
      .orderBy(h(concat_ws(":", col("id"), lit(seed))), col("id"))
      .limit(poolSize)
    val ranked = anchors.select(col("anchor_id"))
      .join(broadcast(pool))
      .filter(col("anchor_id") =!= col("id"))
      .join(positives.select(col("anchor_id"), col("pos_id").as("id")),
        Seq("anchor_id", "id"), "left_anti")
      .withColumn("rank", row_number().over(
        Window.partitionBy("anchor_id").orderBy(
          h(concat_ws(":", col("anchor_id"), col("id"), lit(seed))), col("id"))))
      .filter(col("rank") <= k)
    ranked.select(col("anchor_id"), col("id").as("negative"), col("rank"))
  }

  /** Cluster-blocked form: candidates limited to the anchor's IVF cluster
    * (`centroids` as in `Ann.assign`) — corpus-scale linear, recall bounded
    * by the quantizer like every blocked ANN op here.
    */
  def hardNegativesBlocked(
      vectors: DataFrame, anchors: DataFrame, positives: DataFrame,
      k: Int, centroids: DataFrame): DataFrame = {
    require(k >= 1, s"need k >= 1 (got $k)")
    val assigned = graft.ann.Ann.assign(vectors, centroids)
      .select(col("id"), col("embedding"), col("norm"), col("cluster_id"))
    val a = anchors.select(col("anchor_id"))
      .join(assigned.select(col("id").as("anchor_id"),
        col("embedding").as("qv"), col("norm").as("qn"),
        col("cluster_id")), Seq("anchor_id"))
    val b = assigned
    val scored = a.join(b, Seq("cluster_id"))
      .filter(col("anchor_id") =!= col("id"))
      .join(positives.select(col("anchor_id"), col("pos_id").as("id")),
        Seq("anchor_id", "id"), "left_anti")
      .withColumn("score",
        VectorFunctions.dot(col("qv"), col("embedding")) /
          (col("qn") * col("norm")))
    topK(scored, k)
  }
}
