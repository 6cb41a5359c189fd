package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive training-triplet mining — the embedding-model
  * training-data operator: from a corpus, produce (anchor, positive,
  * hard-negative) triplets where positives are near-duplicate pairs and
  * hard negatives are the anchor's nearest NON-duplicate neighbors in
  * embedding space (close enough to be informative, provably not the
  * same content — the standard hard-negative recipe for training
  * retrievers and embedders).
  *
  * Composition, not re-derivation: the caller supplies the near-dup
  * PAIR frame (any member of the dedup family — exact Jaccard,
  * MinHash, SemDeDup) and the kNN frame (any member of the ANN family
  * — `Ann.knnJoin` exact for oracle replay, `knnJoinBlocked`/IVF at
  * corpus scale). Both inputs are output-sized relative to the corpus,
  * so the mine itself never touches corpus-sized data: one
  * anti-join (drop neighbors that are the anchor's near-dups), one
  * per-anchor window bounded by the kNN's k, one output-sized join.
  */
object Triplets {

  /** Mine triplets.
    *
    * @param pairs undirected near-dup pairs (a, b)
    * @param knn   per-vector neighbors (qid, neighbor, rank, score) —
    *              [[graft.ann.Ann.knnJoin]]'s shape; self-edges absent
    * @param nNeg  hard negatives per anchor (each (anchor, positive)
    *              row fans out to at most nNeg triplets)
    * @return (anchor, positive, negative, neg_cos): every near-dup
    *         direction paired with the anchor's top-nNeg non-dup
    *         neighbors by cosine (ties broken by neighbor id)
    */
  def mine(pairs: DataFrame, knn: DataFrame, nNeg: Int): DataFrame = {
    require(nNeg >= 1, s"nNeg $nNeg must be >= 1")
    // materialize before the self-union double-read: an un-materialized
    // pairs argument is typically a whole candidate-generation pipeline
    val p0 = pairs.select(col("a"), col("b")).localCheckpoint()
    val anchors = p0.select(col("a").as("anchor"), col("b").as("positive"))
      .unionByName(p0.select(col("b").as("anchor"), col("a").as("positive")))
    // negatives: the anchor's nearest neighbors that are NOT its
    // near-dups; re-rank AFTER the anti-join so every anchor still gets
    // nNeg negatives when its top neighbors were duplicates
    val negW = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("neighbor").asc)
    val anchorIds = anchors.select(col("anchor").as("qid")).distinct()
    val negs = knn
      // non-anchor vectors contribute no triplets: drop their kNN rows
      // before the anti-join/window instead of after the final join
      .join(anchorIds, Seq("qid"), "left_semi")
      .join(anchors,
        knn("qid") === anchors("anchor") && knn("neighbor") === anchors("positive"),
        "left_anti")
      .withColumn("nrn", row_number().over(negW))
      .filter(col("nrn") <= nNeg)
      .select(col("qid").as("anchor"), col("neighbor").as("negative"),
        col("score").as("neg_cos"))
    anchors.join(negs, "anchor")
      .select("anchor", "positive", "negative", "neg_cos")
  }
}
