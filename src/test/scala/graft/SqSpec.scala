package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, Sq}

class SqSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("train finds per-dimension bounds; encode hits the byte range ends") {
    val v = vecs(
      1L -> Seq(0f, -1f, 5f),
      2L -> Seq(10f, 1f, 5f),
      3L -> Seq(5f, 0f, 5f))
    val m = Sq.train(v)
    assert(m.mins.toSeq == Seq(0f, -1f, 5f) && m.maxs.toSeq == Seq(10f, 1f, 5f))
    val codes = Sq.encode(v, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L) == Seq(0, 0, 0), "min maps to 0; constant dim maps to 0")
    assert(codes(2L) == Seq(255, 255, 0), "max maps to 255 (clamped floor)")
    assert(codes(3L)(0) == 127 && codes(3L)(1) == 127, "midpoint maps to floor(127.5)")
  }

  test("dequantization error is bounded by one quantization step per dim") {
    val v = Tables.vectors(spark, dir).select("id", "embedding").limit(100)
    val m = Sq.train(v)
    val enc = Sq.encode(v, m).collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val raw = v.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    raw.foreach { case (id, emb) =>
      emb.indices.foreach { d =>
        val step = m.scales(d) / 255.0
        val decoded = m.mins(d).toDouble + enc(id)(d) * step
        assert(math.abs(decoded - emb(d)) <= step + 1e-9,
          s"id $id dim $d: |$decoded - ${emb(d)}| > step $step")
      }
    }
  }

  test("ADC + re-rank recovers the exact brute-force top-k on the corpus") {
    val all = Tables.vectors(spark, dir)
    val m = Sq.train(all.select("id", "embedding"))
    val codes = Sq.encode(all.select("id", "embedding"), m).cache()
    val qs = Tables.queryVectors(spark, dir, Seq(0, 1, 2))
    val sq = Sq.searchAdcRerank(codes, all.select("id", "embedding", "norm"),
      m, qs, k = 5, oversample = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val brute = Ann.bruteTopK(all, qs, 5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(sq == brute, s"SQ8 shortlist missed brute hits: ${brute -- sq}")
    codes.unpersist()
  }
}
