package graft

import graft.operators.Cms

/** Count-Min: never under-estimates, merge = cellwise sum, estimates
  * exact when the sketch is wide enough to avoid collisions.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val data = (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
    Seq.fill(7)("gamma") ++ Seq.fill(1)("delta")).map(Tuple1(_))
    .toDF("term")

  test("point estimates never under-estimate; exact when uncollided") {
    val sk = Cms.sketch(data, "term", width = 1024, depth = 4)
    val est = Cms.estimate(sk, Seq("alpha", "beta", "gamma", "delta", "absent"),
        width = 1024, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 7L,
      "delta" -> 1L, "absent" -> 0L)
    truth.foreach { case (k, v) =>
      assert(est(k) >= v, s"$k under-estimated: ${est(k)} < $v")
    }
    // 4 distinct keys in 1024 buckets x 4 rows: min over rows is exact
    assert(est == truth, s"collision-free sketch must be exact: $est")
  }

  test("merge equals the sketch of the union (cellwise sum)") {
    val a = Cms.sketch(data.limit(40), "term", 256, 3)
    val b = Cms.sketch(data.exceptAll(data.limit(40)), "term", 256, 3)
    val merged = Cms.merge(a, b)
    val whole = Cms.sketch(data, "term", 256, 3)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("weighted counts") {
    val w = Seq(("x", 5L), ("x", 2L), ("y", 10L)).toDF("term", "n")
    val sk = Cms.sketch(w, "term", 512, 4, weightCol = Some("n"))
    val est = Cms.estimate(sk, Seq("x", "y"), 512, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("x" -> 7L, "y" -> 10L))
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Cms.sketch(data, "term", width = 4, depth = 4)
    }
    intercept[IllegalArgumentException] {
      Cms.estimate(Cms.sketch(data, "term", 256, 2), Seq.empty, 256, 2)
    }
  }
}
