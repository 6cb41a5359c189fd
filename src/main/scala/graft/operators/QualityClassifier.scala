package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Margins are exact integer sums of per-bucket weights; p = σ(margin) is
  * a per-row double; each row's gradient contribution rounds to an
  * integer number of micros BEFORE the cross-row sum, so aggregation is
  * exact long arithmetic — immune to float non-associativity under
  * Spark's reduce order — and the weight update divides by N with one
  * symmetric round. A 1-ulp σ() difference between engines flips a
  * contribution only when it lands within ~1e-10 of a rounding boundary —
  * the same accepted exposure as [[graft.dedup.Perplexity]]'s micro-nat
  * floors.
  *
  * Scale shape: features are PACKED per document (one row per doc with a
  * sorted distinct bucket array), and the weight table rides into the
  * plan as a constant dense weight array — so each training round is ONE pass
  * with NO join at all: margin = in-row integer fold over the array,
  * gradient = one explode + combiner-collapsed per-bucket sum (B groups).
  * The B weights round-trip the driver between rounds (bounded by B, not
  * data). T iterations = T passes over the persisted packed frame. The
  * join-based formulation this replaced sorted corpus×features rows by
  * string id every round — measured 19x super-linear at the 64x sweep
  * point from sort spill; the packed form has nothing to sort.
  */
object QualityClassifier {

  /** Packed binary presence features: one row per document —
    * (id, label, buckets) with the SORTED DISTINCT hashed unigram+bigram
    * buckets ([[Dsir.featureBuckets]] hashing). Input: (id, toks,
    * label ∈ {0,1}).
    */
  def features(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(col("id"), col("label"),
      array_sort(array_distinct(Dsir.featureBuckets(col("toks"), buckets)))
        .as("buckets"))

  /** In-row integer margin under a constant dense weight array (exact:
    * long adds in any order are associative). The weights ride as a
    * `typedLit` Literal — ONE constant ArrayData for the whole plan,
    * element_at is an O(1) index. (A `map(...)` literal here would be a
    * CreateMap expression: a fresh 2B-child map materialized PER ROW plus
    * linear-scan lookups — measured as a GC cliff at the 64x sweep
    * point.)
    */
  private def marginCol(warr: Column): Column =
    aggregate(col("buckets"), lit(0L),
      (acc, b) => acc + element_at(warr, b.cast("int") + 1))

  private def weightArray(w: Seq[(Long, Long)]): Column =
    typedLit(w.sortBy(_._1).map(_._2))

  /** Train logistic weights: `iters` full-batch rounds at learning rate
    * `eta` from zero weights. Returns the (bucket, w_micro) table (all B
    * buckets materialized).
    */
  def train(
      feats: DataFrame, // (id, label, buckets) — packed form
      buckets: Int,
      iters: Int,
      eta: Double = 1.0): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val n = feats.count()
    require(n > 0, "empty training set")
    var w: Seq[(Long, Long)] = (0 until buckets).map(b => (b.toLong, 0L))
    for (_ <- 0 until iters) {
      val warr = weightArray(w)
      val grad = feats
        // d_micro = round((sigma(margin) - y) * 1e6): the ONLY float step,
        // quantized per row before any cross-row sum
        .withColumn("d_micro",
          round((lit(1.0) / (lit(1.0) + exp(-marginCol(warr).cast("double") / 1e6))
            - col("label").cast("double")) * 1e6, 0).cast("long"))
        .select(explode(col("buckets")).as("bucket"), col("d_micro"))
        .groupBy("bucket").agg(sum("d_micro").as("g_micro"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      w = w.map { case (b, v) =>
        val g = grad.getOrElse(b, 0L)
        // HALF_UP away from zero over the canonical decimal form — exactly
        // Spark's round(DOUBLE) (BigDecimal.valueOf), which the SQL oracle
        // replays; Math.round would floor negative halves the other way
        val delta = java.math.BigDecimal.valueOf(eta * g.toDouble / n.toDouble)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
        (b, v - delta)
      }
    }
    w.sortBy(_._1).toDF("bucket", "w_micro")
  }

  /** Score documents under trained weights: (id, label, margin_micro, p).
    * Weights may come from [[train]] or any (bucket, w_micro) frame
    * covering the bucket space; they are collected (B rows) into a
    * constant array so scoring is a pure narrow pass.
    */
  def score(feats: DataFrame, weights: DataFrame): DataFrame = {
    val w = weights.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val warr = weightArray(w)
    feats.select(col("id"), col("label"),
        marginCol(warr).as("margin_micro"))
      .withColumn("p",
        lit(1.0) / (lit(1.0) + exp(-col("margin_micro").cast("double") / 1e6)))
  }
}
