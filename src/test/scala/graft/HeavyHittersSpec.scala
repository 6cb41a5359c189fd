package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {

  private def toksDf(terms: Seq[String], parts: Int) = {
    import spark.implicits._
    terms.map(t => (1L, Seq(t))).toDF("id", "toks").repartition(parts)
  }

  test("sketch route equals exact top-k on skewed data with a tiny capacity") {
    // hot=1000, warm=500, 200 singletons; N=1700 — capacity 8 means every
    // term with count > N/8 ≈ 212 is guaranteed a candidate slot, so the
    // recounted top-2 is exact even though the sketch evicts the tail
    val terms = Seq.fill(1000)("hot") ++ Seq.fill(500)("warm") ++
      (0 until 200).map(i => s"t$i")
    for (parts <- Seq(1, 7)) {
      val got = HeavyHitters.topKTerms(toksDf(terms, parts), k = 2, capacity = 8)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == Seq((1, "hot", 1000L), (2, "warm", 500L)),
        s"parts=$parts got $got")
    }
  }

  test("ties break on term ascending; counts are always exact") {
    val terms = Seq.fill(5)("bb") ++ Seq.fill(5)("aa") ++ Seq.fill(3)("cc")
    val got = HeavyHitters.topKTerms(toksDf(terms, 3), k = 3, capacity = 100)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "aa", 5L), (2, "bb", 5L), (3, "cc", 3L)))
  }

  test("null tokens are skipped, not counted or crashed on") {
    import spark.implicits._
    val df = Seq((1L, Seq[String]("a", null, "a", "b")))
      .toDF("id", "toks")
    val got = HeavyHitters.topKTerms(df, k = 5, capacity = 100)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
  }

  test("zipf fit: hand-computed regression over exact counts") {
    // counts 4,2,1 -> ranks 1,2,3; replicate the micro-quantized closed form
    val terms = Seq.fill(4)("aa") ++ Seq.fill(2)("bb") ++ Seq("cc")
    val got = HeavyHitters.zipfFit(toksDf(terms, 2), k = 3, capacity = 100)
      .collect().head
    def micro(x: Double) = math.round(math.log(x) * 1e6)
    val pts = Seq((micro(1), micro(4)), (micro(2), micro(2)), (micro(3), micro(1)))
    val (k, sx, sy) = (3L, pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx).toDouble
    val intercept = (sy.toDouble / k - slope * (sx.toDouble / k)) / 1e6
    assert(got.getLong(0) == 3L)
    assert(math.abs(got.getDouble(1) - slope) < 1e-6)
    assert(math.abs(got.getDouble(2) - intercept) < 1e-6)
    // a 4/2/1 geometric drop is exactly Zipf slope -1-ish in log2 space
    assert(got.getDouble(1) < -1.1 && got.getDouble(1) > -1.4)
  }

  test("the candidate pass is narrow and the recount join broadcasts") {
    val terms = Seq.fill(100)("hot") ++ (0 until 50).map(i => s"t$i")
    val top = HeavyHitters.topKTerms(toksDf(terms, 4), k = 1, capacity = 16)
    // the result is a driver-built local frame (ranks assigned on ≤ k
    // collected rows, the pmiCollocations precedent) — assert semantics
    assert(top.collect().map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("hot", 100L)))
  }
}
