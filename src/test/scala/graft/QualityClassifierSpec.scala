package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Trained-classifier semantics: learning actually separates the classes,
  * the bias absorbs class prior, training is partitioning-invariant, and
  * the model persists through the sidecar round-trip.
  */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  private val B = 64

  // separable corpus: label-1 docs speak "science", label-0 docs "spam"
  private def corpus = (1 to 200).map { i =>
    if (i % 2 == 0)
      (i.toLong, 1, Seq("science", "method", "data", s"noise${i % 7}"))
    else
      (i.toLong, 0, Seq("spam", "click", "win", s"noise${i % 7}"))
  }.toDF("id", "label", "toks")

  test("eight rounds separate a separable corpus") {
    val feats = QualityClassifier.features(corpus, B).cache()
    val model = QualityClassifier.train(feats, B, iters = 8)
    val scored = QualityClassifier.score(feats, model)
      .groupBy("label").agg(avg("p").as("mp"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(scored(1) > scored(0) + 0.2,
      s"no separation: p1=${scored(1)} p0=${scored(0)}")
  }

  test("imbalanced corpus still ranks positives above negatives (bias absorbs prior)") {
    // 5% positives, length-varied negatives — the regime the unbiased
    // sum-pooled form degenerated on (all p ≈ 0, anti-separation)
    val docs = (1 to 200).map { i =>
      if (i % 20 == 0) (i.toLong, 1, Seq("science", "method", "data"))
      else (i.toLong, 0, Seq.fill(i % 7 + 2)("spam") ++ Seq("click", s"n${i % 5}"))
    }.toDF("id", "label", "toks")
    val feats = QualityClassifier.features(docs, B).cache()
    val model = QualityClassifier.train(feats, B, iters = 3)
    val m = QualityClassifier.score(feats, model)
      .groupBy("label").agg(avg("p").as("mp"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(1) > m(0), s"positives must outrank negatives: p1=${m(1)} p0=${m(0)}")
  }

  test("training is partitioning-invariant (exact model equality)") {
    def model(df: org.apache.spark.sql.DataFrame) =
      QualityClassifier.train(QualityClassifier.features(df, B), B, 2)
    val a = model(corpus)
    val b = model(corpus.repartition(13, col("id")))
    assert(a.wMicro == b.wMicro && a.biasMicro == b.biasMicro)
  }

  test("save/load round-trips the model and rejects a tampered sidecar") {
    val feats = QualityClassifier.features(corpus, B).cache()
    val model = QualityClassifier.train(feats, B, 2)
    val tmp = java.nio.file.Files.createTempDirectory("clf").toString + "/m"
    QualityClassifier.save(model, spark, tmp)
    val back = QualityClassifier.load(spark, tmp)
    assert(back.wMicro == model.wMicro && back.biasMicro == model.biasMicro)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tmp, "_meta.json"),
      """{"buckets":64,"checksum":12345}""")
    intercept[IllegalArgumentException](QualityClassifier.load(spark, tmp))
  }
}
