package graft

import org.apache.spark.sql.functions._
import graft.ann.Hamming

class HammingSpec extends SparkSpec {

  import spark.implicits._

  test("sign-bit packing: hand-checked words") {
    // dims 0 and 33 positive, everything else <= 0
    val emb = (0 until 64).map(i => if (i == 0 || i == 33) 1.0f else -1.0f)
    val df = Seq((1L, emb)).toDF("id", "embedding")
    val r = Hamming.codes(df, 64).collect()(0)
    assert(r.getLong(1) == 1L, "lo word: bit 0")
    assert(r.getLong(2) == 2L, "hi word: bit 33 -> bit 1 of hi")
    // zero is NOT positive: a zero vector packs to (0, 0)
    val z = Hamming.codes(
      Seq((2L, Seq.fill(64)(0.0f))).toDF("id", "embedding"), 64).collect()(0)
    assert(z.getLong(1) == 0L && z.getLong(2) == 0L)
  }

  test("self-query ranks itself first; shortlist recall against brute force") {
    val dir = "/root/testdata/sf0.001"
    val vecs = Tables.vectors(spark, dir)
    val qs = Tables.queryVectors(spark, dir, Seq(0, 1, 2))
    val got = Hamming.searchRerank(vecs, qs, dim = 64, k = 5, oversample = 4)
    val byQ = got.collect().groupBy(_.getInt(0))
    for ((q, rows) <- byQ) {
      val top = rows.maxBy(_.getDouble(2))
      assert(top.getLong(1) == q.toLong, s"query $q should find itself (Hamming 0)")
    }
    // recall@5 vs exact: sign codes at 64 bits keep most true neighbors
    val exact = graft.ann.Ann.bruteTopK(vecs, qs, 5).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val ham = got.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val recall = ham.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall unexpectedly low for 64-bit codes")
  }

  test("partitioning invariance") {
    val dir = "/root/testdata/sf0.001"
    val vecs = Tables.vectors(spark, dir)
    val qs = Tables.queryVectors(spark, dir, Seq(0, 1))
    def run(parts: Int) =
      Hamming.searchRerank(vecs.repartition(parts), qs, dim = 64, k = 5)
        .collect().map(r => (r.getInt(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
    assert(run(1) == run(7))
  }
}
