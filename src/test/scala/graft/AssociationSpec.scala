package graft

import graft.operators.Association

/** Pairwise association rules: hand-computed support/confidence/lift,
  * duplicate-event collapse, basket-size cap semantics.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  // baskets: u1 {x,y}, u2 {x,y}, u3 {x,z}, u4 {y} -> N = 4
  private val events = Seq(
    ("u1", "x"), ("u1", "y"), ("u1", "y"), // dup (u1, y) collapses
    ("u2", "x"), ("u2", "y"),
    ("u3", "x"), ("u3", "z"),
    ("u4", "y")).toDF("user", "item")

  test("support, confidence, lift — exact ppm") {
    val got = Association.pairRules(events, "user", "item", minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq.sortBy(t => (t._1, t._2))
    // n(x)=3 n(y)=3 n(z)=1; pair xy=2, xz=1
    assert(got == Seq(
      // (a, b, pair, support, conf a->b, conf b->a, lift)
      ("x", "y", 2L, 500000L, 666666L, 666666L, 888888L),
      ("x", "z", 1L, 250000L, 333333L, 1000000L, 1333333L)))
  }

  test("minPairCount prunes singletons") {
    val got = Association.pairRules(events, "user", "item", minPairCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("x", "y")))
  }

  test("oversized baskets drop whole and leave N") {
    val wide = events.union(
      Seq.tabulate(10)(i => ("mega", s"m$i")).toDF("user", "item"))
    val got = Association.pairRules(wide, "user", "item",
        minPairCount = 1, maxBasketSize = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSeq
      .sortBy(t => (t._1, t._2))
    // mega's 45 pairs gone; N stays 4 (mega counted out)
    assert(got == Seq(("x", "y", 500000L), ("x", "z", 250000L)))
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Association.pairRules(events, "user", "item", minPairCount = 0)
    }
  }
}
