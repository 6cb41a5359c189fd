package graft

import org.apache.spark.sql.functions._
import graft.ann.Pq

class PqSpec extends SparkSpec {

  private val dim = 16
  private val m = 4
  private val k = 4

  /** Clustered fixture: `k` well-separated anchor patterns, vectors jitter
    * around them deterministically.
    */
  private def corpus() = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val anchors = Seq.fill(k)(Array.fill(dim)(rnd.nextGaussian().toFloat * 10f))
    (0 until 120).map { i =>
      val a = anchors(i % k)
      (i.toString, a.map(v => v + rnd.nextGaussian().toFloat * 0.05f).toSeq)
    }.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>"))
  }

  test("PQ: deterministic training, valid codes, ADC finds the right cluster") {
    val vecs = corpus()
    val cb = Pq.train(vecs, dim, m, k, iters = 2)
    assert(cb.size == m && cb.forall(_.size == k) &&
      cb.forall(_.forall(_.length == dim / m)))

    // bit-reproducible: same data -> same codebooks
    val cb2 = Pq.train(vecs, dim, m, k, iters = 2)
    assert(cb.zip(cb2).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })

    val codes = Pq.encode(vecs, dim, cb).cache()
    assert(codes.count() == 120)
    val codeRows = codes.collect()
    assert(codeRows.forall(_.getSeq[Int](1).size == m))
    assert(codeRows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < k)))
    // ADC recall on the well-separated corpus: the 30 same-cluster members
    // (jitter 0.05 around an anchor of scale ~10) must occupy the ENTIRE
    // top-30 — quantization error is orders of magnitude below the
    // anchor separation
    val q = vecs.filter(col("id") === "7").select("embedding")
      .collect()(0).getSeq[Float](0)
    val top = Pq.searchAdc(codes, cb, Seq(0 -> q), 30).collect()
    assert(top.length == 30)
    val topIds = top.map(_.getString(1).toInt)
    assert(topIds.forall(_ % k == 7 % k),
      s"ADC top-30 must be exactly the query's cluster, got ${topIds.toSeq}")

    // ADC scores from the column expression match a driver-side mirror
    val cbB = cb
    def adcScala(codesArr: Seq[Int]): Double = {
      val ds = dim / m
      codesArr.zipWithIndex.map { case (c, j) =>
        val sub = q.slice(j * ds, (j + 1) * ds)
        val w = cbB(j)(c)
        sub.zip(w).map { case (x, y) =>
          val d = x.toDouble - y.toDouble; d * d }.sum
      }.sum
    }
    val scored = Pq.searchAdc(codes, cb, Seq(0 -> q), 120).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    codeRows.take(10).foreach { r =>
      val expect = adcScala(r.getSeq[Int](1))
      assert(math.abs(scored(r.getString(0)) - expect) < 1e-9,
        s"column ADC must equal the scalar mirror for ${r.getString(0)}")
    }
    codes.unpersist()
  }

  test("PQ rerank: ADC shortlist + exact cosine matches brute-force top-k") {
    import spark.implicits._
    val vecs = corpus()
      .select(col("id"), col("embedding"),
        graft.functions.VectorFunctions.l2Norm(col("embedding")).as("norm"))
    val cb = Pq.train(vecs, dim, m, k, iters = 2)
    val codes = Pq.encode(vecs, dim, cb)
    val q = vecs.filter(col("id") === "13").select("embedding")
      .collect()(0).getSeq[Float](0)
    // oversample must exceed the ADC tie granularity: same-cluster members
    // quantize to (near-)identical codes, so the shortlist has to cover the
    // whole tie bucket (30 cluster members here) for exact-rerank recall
    val rerank = Pq.searchAdcRerank(codes, vecs, cb, Seq(0 -> q), 5,
        oversample = 8)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    // exact brute force over the full corpus
    val exact = graft.ann.Ann.bruteTopK(vecs, Seq(0 -> q), 5)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(rerank.map(_._1).toSeq == exact.map(_._1).toSeq,
      s"rerank ids ${rerank.map(_._1).toSeq} != exact ${exact.map(_._1).toSeq}")
    rerank.zip(exact).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9, "rerank scores must be the exact scores")
    }
  }
}
