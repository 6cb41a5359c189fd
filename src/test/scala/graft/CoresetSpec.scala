package graft

import graft.operators.Coreset

/** Greedy k-center over a hand-built geometry: four tight angular
  * clusters in 2-D — farthest-point traversal must pick one member per
  * cluster before ever doubling up, with deterministic seed/tie rules.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  // angles (degrees): cluster A ~ 0, B ~ 90, C ~ 180, D ~ 270
  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  private val pts = Seq(
    10L -> vec(0), 11L -> vec(4),     // A
    20L -> vec(90), 21L -> vec(94),   // B
    30L -> vec(180), 31L -> vec(184), // C
    40L -> vec(270), 41L -> vec(274)  // D
  ).toDF("vec_id", "embedding")

  test("picks one representative per angular cluster before doubling up") {
    val got = Coreset.kCenter(pts, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // seed = min id (10, cluster A); rank 2 = farthest = cluster C
    // (cos 180° vs 0° = -1); ranks 3-4 = the two orthogonal clusters
    assert(got.map(_._1) == Seq(1, 2, 3, 4))
    assert(got.head._2 == 10L)
    assert(got(1)._2 == 30L, s"farthest from A must be in C: $got")
    val clusters = got.map(_._2 / 10)
    assert(clusters.toSet == Set(1L, 2L, 3L, 4L),
      s"one per cluster, got $got")
  }

  test("sel_dist sequence is the non-increasing coverage radius") {
    val rows = Coreset.kCenter(pts, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getInt(0), r.getDouble(2))).toSeq
    assert(rows.head._2 == -1.0)
    val dists = rows.tail.map(_._2)
    assert(dists == dists.sorted.reverse, s"non-increasing: $dists")
    assert(math.abs(dists.head - 2.0) < 1e-6, "antipodal first expansion")
  }

  test("k = 1 returns just the deterministic seed") {
    val got = Coreset.kCenter(pts, "vec_id", "embedding", k = 1).collect()
    assert(got.length == 1 && got.head.getLong(1) == 10L)
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Coreset.kCenter(pts, "vec_id", "embedding", k = 0)
    }
  }
}
