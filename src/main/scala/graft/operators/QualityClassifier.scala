package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable quality classifier — the fastText-style linear filter the
  * big pretraining pipelines use (GPT-3/LLaMA: score documents by a
  * classifier trained "does this look like the trusted corpus?"):
  * logistic regression over hashed n-gram features with MEAN pooling and
  * a bias term (the fastText model shape — the mean absorbs document
  * length, the bias absorbs class prior; without them, margins are
  * dominated by length × prior and the model degenerates on realistic
  * imbalanced corpora — measured: every p < 0.024 and ANTI-separation on
  * the 5%-positive entry corpus before this form). Trained by full-batch
  * gradient descent ON THE CLUSTER, then applied as a scoring pass.
  *
  * Determinism (the part that makes distributed training reproducible and
  * SQL-replayable): weights, bias, and margins live in MICRO units
  * (1e-6). margin_µ = bias_µ + round(Σ_b w_b / n) is re-quantized per
  * document; p = σ(margin_µ/1e6) is a per-row double; each row's
  * gradient contributions round to integer micros BEFORE the cross-row
  * sums (c = round((p−y)·1e6/n) toward the weights, d = round((p−y)·1e6)
  * toward the bias), so aggregation is exact long arithmetic — immune to
  * float non-associativity under Spark's reduce order. A 1-ulp σ()
  * difference between engines flips a contribution only within ~1e-10 of
  * a rounding boundary — the same accepted exposure as
  * [[graft.dedup.Perplexity]]'s micro-nat floors.
  *
  * Scale shape: features are PACKED per document (one row per doc with a
  * sorted distinct bucket array), and the weights ride into the plan as a
  * constant dense array — each training round is ONE pass with NO join:
  * margin = in-row integer fold, gradients = one explode + combiner-
  * collapsed per-bucket sum (B groups) plus one scalar aggregate. The B+1
  * parameters round-trip the driver between rounds (bounded by B, not
  * data). T iterations = T passes over the persisted packed frame. (An
  * earlier join-based formulation sorted corpus×features rows by string
  * id every round — 19x super-linear at the 64x sweep point from sort
  * spill; the packed form has nothing to sort.)
  */
object QualityClassifier {

  /** Trained model: per-bucket micro-weights (dense, index = bucket) and
    * the micro-bias.
    */
  final case class Model(wMicro: IndexedSeq[Long], biasMicro: Long)

  /** Packed binary presence features: one row per document —
    * (id, label, buckets) with the SORTED DISTINCT hashed unigram+bigram
    * buckets ([[Dsir.featureBuckets]] hashing). Input: (id, toks,
    * label ∈ {0,1}).
    */
  def features(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(col("id"), col("label"),
      array_sort(array_distinct(Dsir.featureBuckets(col("toks"), buckets)))
        .as("buckets"))

  /** Per-doc micro-margin: bias + round(mean of bucket weights). The fold
    * is exact long addition; the mean divides once in double and
    * re-quantizes (featureless docs sit at the bias alone).
    */
  private def marginCol(m: Model): Column = {
    val warr = typedLit(m.wMicro)
    val sumW = aggregate(col("buckets"), lit(0L),
      (acc, b) => acc + element_at(warr, b.cast("int") + 1))
    lit(m.biasMicro) + when(size(col("buckets")) > 0,
      round(sumW.cast("double") / size(col("buckets")).cast("double"), 0).cast("long"))
      .otherwise(lit(0L))
  }

  private def pCol(margin: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-margin.cast("double") / 1e6))

  /** Train: `iters` full-batch rounds at learning rate `eta` from zero.
    */
  def train(
      feats: DataFrame, // (id, label, buckets) — packed form
      buckets: Int,
      iters: Int,
      eta: Double = 4.0): Model = {
    val n = feats.count()
    require(n > 0, "empty training set")
    var model = Model(IndexedSeq.fill(buckets)(0L), 0L)
    // HALF_UP away from zero over the canonical decimal form — exactly
    // Spark's round(DOUBLE), which the SQL oracle replays; Math.round
    // would floor negative halves the other way
    def roundHalfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    for (_ <- 0 until iters) {
      val perDoc = feats
        .withColumn("pv", pCol(marginCol(model)))
        // the ONLY float steps, quantized per row before any cross-row sum
        .withColumn("d_micro",
          round((col("pv") - col("label").cast("double")) * 1e6, 0).cast("long"))
        .withColumn("c_micro",
          when(size(col("buckets")) > 0,
            round((col("pv") - col("label").cast("double")) * 1e6 /
              size(col("buckets")).cast("double"), 0).cast("long"))
            .otherwise(lit(0L)))
      // ONE pass per iteration: the bias gradient rides the same exploded
      // aggregation under the synthetic bucket -1 (its row carries the
      // per-DOC d_micro exactly once), instead of a second full scan +
      // margin fold over feats just for sum(d_micro) — exact long sums
      // either way, so the trained model is bit-identical
      // coalesce: a NULL buckets array (null toks) must still contribute
      // its bias row — concat(null, array(...)) is null and explode would
      // silently drop the doc's d_micro from the gradient
      val agg = perDoc.select(explode(concat(
          transform(coalesce(col("buckets"),
            array().cast("array<bigint>")), b =>
            struct(b.cast("long").as("bucket"), col("c_micro").as("v"))),
          array(struct(lit(-1L).as("bucket"), col("d_micro").as("v")))))
          .as("e"))
        .select(col("e.bucket").as("bucket"), col("e.v").as("v"))
      val sums = agg.groupBy("bucket").agg(sum("v").as("g"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val grad = sums - (-1L)
      val gBias = sums.getOrElse(-1L, 0L)
      model = Model(
        model.wMicro.zipWithIndex.map { case (v, b) =>
          v - roundHalfUp(eta * grad.getOrElse(b.toLong, 0L).toDouble / n.toDouble)
        },
        model.biasMicro - roundHalfUp(eta * gBias.toDouble / n.toDouble))
    }
    model
  }

  /** Score documents under a trained model: (id, label, margin_micro, p).
    */
  def score(feats: DataFrame, model: Model): DataFrame =
    feats.select(col("id"), col("label"),
        marginCol(model).as("margin_micro"))
      .withColumn("p", pCol(col("margin_micro")))

  /** Persist a trained model: parquet (bucket, w_micro; bias at bucket
    * −1) plus a JSON meta sidecar (bucket count, checksum) — the same
    * artifact-plus-sidecar convention as the ANN index builders, so a
    * scoring job (batch or streaming compaction) loads the model without
    * retraining.
    */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    val rows = (-1L, model.biasMicro) +:
      model.wMicro.zipWithIndex.map { case (v, b) => (b.toLong, v) }
    rows.toDF("bucket", "w_micro")
      .coalesce(1).write.mode("overwrite").parquet(path)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path, "_meta.json"),
      s"""{"buckets":${model.wMicro.length},"checksum":${checksum(model)}}""")
  }

  /** Load a [[save]]d model, verifying the sidecar so a torn/partial
    * write fails loudly instead of scoring garbage.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val (biasRows, wRows) = rows.partition(_._1 == -1L)
    require(biasRows.length == 1, s"model at $path has no bias row")
    val model = Model(wRows.map(_._2).toIndexedSeq, biasRows.head._2)
    val meta = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_meta.json"))
    require(meta.contains(s""""buckets":${model.wMicro.length}""") &&
      meta.contains(s""""checksum":${checksum(model)}"""),
      s"classifier model at $path does not match its meta sidecar")
    model
  }

  private def checksum(m: Model): Long =
    m.wMicro.foldLeft(m.biasMicro)((a, v) => a * 31 ^ v)
}
