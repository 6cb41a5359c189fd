package graft

import graft.operators.BottomK

/** Bottom-k signatures: estimator sanity against exact Jaccard on
  * constructed overlaps, and exactness when k covers the union.
  */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  test("exact when k >= |union|: estimate equals true Jaccard") {
    // A = 1..60, B = 41..100 -> |inter| = 20, |union| = 100, J = 0.2
    val rows = ((1 to 60).map(i => ("a", s"v$i")) ++
      (41 to 100).map(i => ("b", s"v$i"))).toDF("src", "v")
    val sigs = BottomK.signatures(rows, "src", "v", k = 200)
    val est = BottomK.jaccardEstimates(sigs, k = 200).collect().head
    assert(est.getAs[String]("grp_a") == "a" && est.getAs[String]("grp_b") == "b")
    assert(est.getAs[Long]("k_used") == 100L)
    assert(est.getAs[Long]("inter") == 20L)
    assert(est.getAs[Long]("est_ppm") == 200000L)
  }

  test("sketched estimate lands near the true Jaccard") {
    // A = 1..2000, B = 1001..3000 -> J = 1000/3000 = 1/3
    val rows = ((1 to 2000).map(i => ("a", s"w$i")) ++
      (1001 to 3000).map(i => ("b", s"w$i"))).toDF("src", "v")
    val sigs = BottomK.signatures(rows, "src", "v", k = 256)
    val est = BottomK.jaccardEstimates(sigs, k = 256).collect().head
    val ppm = est.getAs[Long]("est_ppm")
    assert(math.abs(ppm - 333333L) < 100000L, s"est_ppm $ppm vs ~333333")
  }

  test("signatures are the k smallest distinct hashes") {
    val rows = (1 to 50).map(i => ("g", s"x${i % 25}")).toDF("src", "v") // dups
    val sig = BottomK.signatures(rows, "src", "v", k = 10)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(sig.length == 10 && sig == sig.distinct)
  }

  test("guards") {
    val rows = Seq(("g", "x")).toDF("src", "v")
    intercept[IllegalArgumentException] {
      BottomK.signatures(rows, "src", "v", 0)
    }
  }
}
