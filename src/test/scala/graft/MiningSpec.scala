package graft

import org.apache.spark.sql.functions._
import graft.operators.Mining
import graft.functions.VectorFunctions

/** Hard-negative mining: positives and self are excluded BEFORE ranking
  * (k negatives means k negatives), ordering follows cosine, and the
  * cluster-blocked scale path keeps most of exact recall on clusterable
  * geometry.
  */
class MiningSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
      .withColumn("norm", VectorFunctions.l2Norm(col("embedding")))

  test("positives and self never rank; hardest negative comes first") {
    // anchor 1 at (1,0); positive 2 is nearly identical (would be rank 1);
    // 3 is the intended hard negative; 4 easier; 5 orthogonal
    val v = vecs(
      (1L, Seq(1f, 0f)),
      (2L, Seq(0.999f, 0.01f)),
      (3L, Seq(0.9f, 0.4f)),
      (4L, Seq(0.6f, 0.8f)),
      (5L, Seq(0f, 1f)))
    val out = Mining.hardNegatives(v,
      Seq(1L).toDF("anchor_id"), Seq((1L, 2L)).toDF("anchor_id", "pos_id"),
      k = 3).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("negative")).toSeq == Seq(3L, 4L, 5L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    // k negatives even though the positive outscored them all
    assert(!out.exists(r => r.getAs[Long]("negative") == 2L))
  }

  test("random negatives: deterministic, exclusion holds, anchors differ") {
    val v = vecs((0L to 30L).map(i => (i, Seq(i.toFloat, 1f))): _*)
    val anchors = Seq(0L, 10L).toDF("anchor_id")
    val positives = Seq((0L, 1L), (10L, 11L)).toDF("anchor_id", "pos_id")
    def run() = Mining.randomNegatives(v, anchors, positives,
      k = 4, poolSize = 16, seed = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val a = run()
    assert(a == run(), "same seed -> same negatives")
    assert(a.count(_._1 == 0L) == 4 && a.count(_._1 == 10L) == 4)
    assert(!a.contains((0L, 1L, 1)) && a.forall { case (aid, n, _) => n != aid })
    assert(!a.filter(_._1 == 0L).exists(_._2 == 1L), "positive excluded")
    // the per-(anchor, candidate) hash gives anchors different draws
    assert(a.filter(_._1 == 0L).map(_._2) != a.filter(_._1 == 10L).map(_._2))
    val b = Mining.randomNegatives(v, anchors, positives,
      k = 4, poolSize = 16, seed = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(a != b, "seed changes the draw")
  }

  test("blocked variant recovers exact results on well-separated clusters") {
    // two tight clusters; anchors and their negatives co-habit a cluster
    val cluster1 = (0 until 20).map(i =>
      (i.toLong, Seq(1f + i * 0.001f, 0.1f * (i % 3))))
    val cluster2 = (20 until 40).map(i =>
      (i.toLong, Seq(-1f - i * 0.001f, 5f + 0.1f * (i % 3))))
    val v = vecs((cluster1 ++ cluster2): _*)
    val anchors = Seq(0L, 25L).toDF("anchor_id")
    val positives = Seq((0L, 1L), (25L, 26L)).toDF("anchor_id", "pos_id")
    val cents = Seq((0L, Seq(1f, 0.1f)), (1L, Seq(-1f, 5f)))
      .toDF("centroid_id", "centroid")
      .select(col("centroid_id"),
        col("centroid").cast("array<float>").as("centroid"))
      .withColumn("centroid_norm", VectorFunctions.l2Norm(col("centroid")))
    val exact = Mining.hardNegatives(v, anchors, positives, k = 5)
      .select("anchor_id", "negative").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Mining.hardNegativesBlocked(v, anchors, positives, k = 5, cents)
      .select("anchor_id", "negative").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & blocked).size.toDouble / exact.size
    assert(recall == 1.0, s"clusterable geometry should be lossless: $recall")
  }
}
