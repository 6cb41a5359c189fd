package graft

import org.apache.spark.sql.functions._
import graft.operators.Triplets

class TripletsSpec extends SparkSpec {

  // hand-laid 2-D geometry: 0~1 near-dups and mutually nearest; 2 close
  // to both (the hard negative); 3 orthogonal-ish (the easy negative)
  private def knnOf(vs: Seq[(Long, Seq[Float])], k: Int) = {
    import spark.implicits._
    val df = vs.toDF("id", "embedding")
      .withColumn("norm", sqrt(aggregate(transform(col("embedding"),
        x => x * x), lit(0.0d), (a, x) => a + x)))
    graft.ann.Ann.knnJoin(df, k)
  }

  private val vecs = Seq(
    0L -> Seq(1.0f, 0.0f),
    1L -> Seq(0.99f, 0.1f),
    2L -> Seq(0.8f, 0.6f),
    3L -> Seq(0.0f, 1.0f))

  test("positives are excluded and negatives re-rank after exclusion") {
    import spark.implicits._
    val pairs = Seq((0L, 1L)).toDF("a", "b")
    val got = Triplets.mine(pairs, knnOf(vecs, k = 3), nNeg = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // anchor 0: nearest is 1 (the positive — excluded), negatives = 2 then 3
    // anchor 1: symmetric
    assert(got == Set((0L, 1L, 2L), (0L, 1L, 3L), (1L, 0L, 2L), (1L, 0L, 3L)))
  }

  test("nNeg bounds the fan-out and non-anchors contribute nothing") {
    import spark.implicits._
    val pairs = Seq((0L, 1L)).toDF("a", "b")
    val out = Triplets.mine(pairs, knnOf(vecs, k = 3), nNeg = 1)
    assert(out.count() == 2L) // one negative per direction
    assert(out.filter(col("anchor").isin(2L, 3L)).isEmpty)
  }

  test("neg_cos carries the kNN score and is partitioning-invariant") {
    import spark.implicits._
    val pairs = Seq((0L, 1L), (2L, 3L)).toDF("a", "b")
    val knn = knnOf(vecs, k = 3)
    val one = Triplets.mine(pairs.repartition(1), knn, nNeg = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    val many = Triplets.mine(pairs.repartition(5), knn.repartition(7), nNeg = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    assert(one == many && one.nonEmpty)
  }
}
