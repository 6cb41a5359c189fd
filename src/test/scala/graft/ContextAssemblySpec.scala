package graft

import graft.search.ContextAssembly

/** Context assembly semantics: greedy prefix per query under the budget. */
class ContextAssemblySpec extends SparkSpec {

  import spark.implicits._

  test("greedy prefix stops at the first overflow, per query independently") {
    val results = Seq(
      (0, 1L, 0.9, 50L), (0, 2L, 0.8, 60L), (0, 3L, 0.7, 100L), (0, 4L, 0.6, 5L),
      (1, 9L, 0.99, 200L), (1, 8L, 0.5, 1L)
    ).toDF("query_idx", "id", "score", "tokens")
    val out = ContextAssembly.assemble(results, 120L)
      .orderBy("query_idx", "rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(4), r.getLong(5)))
    // q0: 50+60=110 fits; rank-3 (100) overflows and CUTS — rank-4 (5)
    // would fit but is never reached (prefix, not skip)
    // q1: 200 overflows immediately -> empty context for q1
    assert(out.toSeq == Seq((0, 1L, 1, 50L), (0, 2L, 2, 110L)))
  }

  test("rank order is score desc then id asc") {
    val results = Seq(
      (0, 5L, 0.5, 1L), (0, 3L, 0.5, 1L), (0, 4L, 0.9, 1L)
    ).toDF("query_idx", "id", "score", "tokens")
    val ids = ContextAssembly.assemble(results, 10L)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(ids == Seq(4L, 3L, 5L))
  }
}
