package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable quality classifier — the fastText-style linear filter the
  * big pretraining pipelines use (GPT-3/LLaMA: score documents by a
  * classifier trained "does this look like the trusted corpus?"):
  * logistic regression over hashed n-gram presence features, trained by
  * full-batch gradient descent ON THE CLUSTER, then applied as a scoring
  * pass.
  *
  * Determinism (the part that makes distributed training reproducible and
  * SQL-replayable): weights and gradients live in MICRO units (1e-6).
  * Each round, margins are exact integer sums of per-bucket weights;
  * p = σ(margin) is a per-row double; each row's gradient contribution
  * rounds to an integer number of micros BEFORE the cross-row sum, so the
  * aggregation is exact long arithmetic — immune to float
  * non-associativity under Spark's reduce order — and the weight update
  * divides by N with one symmetric round. A 1-ulp σ() difference between
  * engines flips a contribution only when it lands within ~1e-10 of a
  * rounding boundary — the same accepted exposure as
  * [[graft.dedup.Perplexity]]'s micro-nat floors.
  *
  * Scale shape: each iteration is ONE pass over the (id, bucket) feature
  * frame — a broadcast join against the B-row weight table, a per-doc
  * combiner-collapsed margin sum, and a per-bucket gradient sum; the
  * weights (B longs) come back to the driver between rounds (bounded by
  * B, not data). T iterations = T passes; persist the feature frame.
  */
object QualityClassifier {

  /** Binary presence features: distinct hashed unigram+bigram buckets per
    * document ([[Dsir.featureBuckets]] hashing), plus the label column.
    * Input: (id, toks, label ∈ {0,1}); output: (id, label, bucket) rows.
    */
  def features(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(col("id"), col("label"),
      explode(Dsir.featureBuckets(col("toks"), buckets)).as("bucket"))
      .distinct()

  /** Per-doc margins under a weight table: (id, label, margin_micro). */
  private def margins(feats: DataFrame, weights: DataFrame): DataFrame =
    feats
      .join(broadcast(weights), Seq("bucket"))
      .groupBy("id", "label")
      .agg(sum("w_micro").as("margin_micro"))

  /** Train logistic weights: `iters` full-batch rounds at learning rate
    * `eta` from zero weights. Returns the (bucket, w_micro) table
    * (missing buckets = weight 0 are materialized; B rows).
    */
  def train(
      feats: DataFrame, // (id, label, bucket)
      buckets: Int,
      iters: Int,
      eta: Double = 1.0): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val n = feats.select("id").distinct().count()
    require(n > 0, "empty training set")
    var w = (0 until buckets).map(b => (b.toLong, 0L)).toDF("bucket", "w_micro")
    for (_ <- 0 until iters) {
      val m = margins(feats, w)
        // d_micro = round((sigma(margin) - y) * 1e6): the ONLY float step,
        // quantized per row before any cross-row sum
        .withColumn("d_micro",
          round((lit(1.0) / (lit(1.0) + exp(-col("margin_micro").cast("double") / 1e6))
            - col("label").cast("double")) * 1e6, 0).cast("long"))
        .select("id", "d_micro")
      val grad = feats.join(m, Seq("id"))
        .groupBy("bucket").agg(sum("d_micro").as("g_micro"))
      val updated = w.join(grad, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("w_micro") - round(lit(eta) *
            coalesce(col("g_micro"), lit(0L)).cast("double") / n.toDouble, 0)
            .cast("long")).as("w_micro"))
      // B rows round-trip the driver so each iteration's plan starts from
      // literal weights (no ever-growing lineage across rounds)
      w = updated.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sortBy(_._1).toDF("bucket", "w_micro")
    }
    w
  }

  /** Score documents under trained weights: (id, label, margin_micro, p).
    */
  def score(feats: DataFrame, weights: DataFrame): DataFrame =
    margins(feats, weights)
      .withColumn("p",
        lit(1.0) / (lit(1.0) + exp(-col("margin_micro").cast("double") / 1e6)))
}
