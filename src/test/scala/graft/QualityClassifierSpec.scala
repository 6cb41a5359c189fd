package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Trained-classifier semantics: learning actually separates the classes,
  * training is partitioning-invariant, and more rounds improve fit.
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

  test("two rounds separate a separable corpus") {
    val feats = QualityClassifier.features(corpus, B).cache()
    val w = QualityClassifier.train(feats, B, iters = 2)
    val scored = QualityClassifier.score(feats, w)
      .groupBy("label").agg(avg("p").as("mp"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(scored(1) > 0.7 && scored(0) < 0.3,
      s"no separation: p1=${scored(1)} p0=${scored(0)}")
  }

  test("training is partitioning-invariant (exact weight equality)") {
    def weights(df: org.apache.spark.sql.DataFrame) =
      QualityClassifier.train(QualityClassifier.features(df, B), B, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(weights(corpus) == weights(corpus.repartition(13, col("id"))))
  }

  test("a third round does not hurt the separable fit") {
    val feats = QualityClassifier.features(corpus, B).cache()
    def gap(iters: Int) = {
      val m = QualityClassifier.score(feats,
          QualityClassifier.train(feats, B, iters))
        .groupBy("label").agg(avg("p").as("mp"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      m(1) - m(0)
    }
    assert(gap(3) >= gap(2) - 1e-9)
  }
}
