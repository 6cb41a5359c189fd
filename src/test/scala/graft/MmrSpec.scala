package graft

import org.apache.spark.sql.functions.col
import graft.search.Mmr

class MmrSpec extends SparkSpec {

  private def short(rows: (Long, Double, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("id", "score", "embedding")
      .select(col("id"), col("score"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("diversity beats raw relevance: near-duplicate of the leader demotes") {
    // c2 is a copy of c1 (cos 1); c3 is orthogonal (cos 0) with lower rel.
    // Pure relevance order 1,2,3 — MMR at lambda 0.5 picks 1, then 3
    // (0.25 beats 0.465 - 0.5 = -0.035), then 2.
    val r = Mmr.rerank(short(
      (1L, 0.95, Seq(1f, 0f)),
      (2L, 0.93, Seq(1f, 0f)),
      (3L, 0.50, Seq(0f, 1f))), k = 3)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getDouble(3)))
    assert(r.map(_._2).toSeq == Seq(1L, 3L, 2L))
    assert(math.abs(r(0)._3 - 0.475) < 1e-12, "first pick mmr = lambda * rel")
    assert(math.abs(r(1)._3 - 0.25) < 1e-12)
    assert(math.abs(r(2)._3 - (0.465 - 0.5)) < 1e-12)
  }

  test("ties break to the lower id; k caps at candidate count") {
    val r = Mmr.rerank(short(
      (7L, 0.9, Seq(1f, 0f)),
      (4L, 0.9, Seq(0f, 1f))), k = 5)
      .collect().map(x => x.getLong(1)).toSeq
    assert(r == Seq(4L, 7L), "equal mmr -> lower id first; only 2 rows out")
  }

  test("id stays type-generic: string ids survive the re-rank untouched") {
    import spark.implicits._
    val in = Seq(
      ("doc-a", 0.95, Seq(1f, 0f)),
      ("doc-b", 0.93, Seq(1f, 0f)),
      ("doc-c", 0.50, Seq(0f, 1f)))
      .toDF("id", "score", "embedding")
      .select(col("id"), col("score"),
        col("embedding").cast("array<float>").as("embedding"))
    val r = Mmr.rerank(in, k = 3)
    assert(r.schema("id").dataType.typeName == "string")
    assert(r.collect().map(_.getString(1)).toSeq == Seq("doc-a", "doc-c", "doc-b"))
  }
}
