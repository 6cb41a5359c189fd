package graft

import graft.operators.Batching

/** Length-bucketed batching: the histogram-offset + keyed-window rank
  * must equal the single-window (len DESC, id) definition, including
  * duplicate lengths split across the batch boundary.
  */
class BatchingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, 10L), (2L, 30L), (3L, 30L), (4L, 20L),
    (5L, 30L), (6L, 10L), (7L, 25L)).toDF("id", "len")

  test("byLength ranks (len DESC, id) and cuts fixed batches") {
    val got = Batching.byLength(docs, "id", "len", batchSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._2)
    // order: len 30 ids 2,3,5 | 25 id 7 | 20 id 4 | 10 ids 1,6
    assert(got == Seq(
      (2L, 0L, 0L), (3L, 1L, 0L), (5L, 2L, 0L),
      (7L, 3L, 1L), (4L, 4L, 1L), (1L, 5L, 1L),
      (6L, 6L, 2L)))
  }

  test("paddingReport: exact per-batch waste") {
    val rep = Batching.paddingReport(
        Batching.byLength(docs, "id", "len", batchSize = 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rep == Seq(
      (0L, 3L, 30L, 90L, 0L),   // three equal 30s: no waste
      (1L, 3L, 25L, 55L, 20L),  // 25,20,10 pad to 25
      (2L, 1L, 10L, 10L, 0L)))  // lone tail
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Batching.byLength(docs, "id", "len", batchSize = 0)
    }
  }
}
