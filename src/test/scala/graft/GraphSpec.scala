package graft

import graft.operators.Graph

/** Integer PageRank over the near-dup pair graph: hand-computed path-graph
  * values, orientation/duplicate invariance, and the no-dangling property
  * of the symmetrized update.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Graph.pageRank(pairs.toDF("a", "b"), iters).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("rank_micro"))).toMap

  test("path graph 1-2-3: two hand-computed iterations") {
    // symmetrized degs: 1->1, 2->2, 3->1
    // iter1: r2 = 150000 + 85*(1e6+1e6)/100 = 1850000
    //        r1 = r3 = 150000 + 85*(1e6 div 2)/100 = 575000
    // iter2: r2 = 150000 + (85*1150000) div 100 = 1127500
    //        r1 = r3 = 150000 + (85*(1850000 div 2)) div 100 = 936250
    val one = ranks(Seq((1L, 2L), (2L, 3L)), iters = 1)
    assert(one(1L) == (1L, 575000L))
    assert(one(2L) == (2L, 1850000L))
    assert(one(3L) == (1L, 575000L))
    val two = ranks(Seq((1L, 2L), (2L, 3L)), iters = 2)
    assert(two(1L) == (1L, 936250L))
    assert(two(2L) == (2L, 1127500L))
    assert(two(3L) == (1L, 936250L))
  }

  test("pair orientation and duplicate pair rows do not change the result") {
    val base = ranks(Seq((1L, 2L), (2L, 3L)), iters = 3)
    val flipped = ranks(Seq((2L, 1L), (3L, 2L)), iters = 3)
    val dup = ranks(Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L)), iters = 3)
    assert(flipped == base)
    assert(dup == base)
  }

  test("hub node outranks leaves; disconnected components don't interact") {
    // star 10-(11,12,13) plus isolated edge 20-21
    val m = ranks(Seq((10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L)), iters = 5)
    assert(m(10L)._2 > m(11L)._2)
    assert(m(11L) == m(12L) && m(12L) == m(13L))
    // the isolated pair is a symmetric 2-cycle: rank stays at the
    // fixed point 150000 + 85*1e6/100 = 1000000 every iteration
    assert(m(20L) == (1L, 1000000L))
    assert(m(21L) == (1L, 1000000L))
  }
}
