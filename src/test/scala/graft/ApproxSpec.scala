package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

/** Approx swap-ins hold their error bounds at the 64x-sweep row count
  * (~300k rows): approx_percentile within its Greenwald-Khanna rank-error
  * envelope against the exact sort-based form, and HyperLogLog distinct
  * within a few relative standard deviations of the exact count. The
  * EXACT forms remain the driver oracles (q_text_percentiles,
  * q_corpus_profile); these sketches are the documented 100 TB
  * substitutes.
  */
class ApproxSpec extends SparkSpec {

  import spark.implicits._

  private val n = 300000
  // skewed (quadratic) distribution over ~5 groups — percentile error is
  // most visible off-uniform
  private lazy val data = spark.range(n)
    .select(
      concat(lit("g"), (col("id") % 5)).as("grp"),
      ((col("id") * col("id")) % 9973).cast("double").as("v"),
      (col("id") % 87013).as("k"))
    .localCheckpoint()

  test("approx_percentile stays within the rank-error envelope at 300k rows") {
    val ps = Seq(0.5, 0.9, 0.99)
    val acc = 10000 // rank error <= 1/acc = 1e-4
    val exact = Profile.percentiles(data, "grp", "v", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val approx = Profile.percentiles(data, "grp", "v", ps, approx = true, accuracy = acc)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // translate rank error to a value envelope: the approx value must lie
    // between the exact quantiles at p +- 10/acc (10x headroom on the bound)
    val eps = 10.0 / acc
    ps.foreach { p =>
      val lo = Profile.percentiles(data, "grp", "v", Seq(math.max(0.0, p - eps)))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      val hi = Profile.percentiles(data, "grp", "v", Seq(math.min(1.0, p + eps)))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      lo.keys.foreach { g =>
        val a = approx((g, p))
        assert(a >= lo(g) && a <= hi(g),
          s"approx p$p for $g = $a outside [${lo(g)}, ${hi(g)}]")
      }
    }
  }

  test("HLL distinct count stays within 3 rsd of exact at 300k rows") {
    val exact = Profile.profile(data, Seq("k"))
      .collect()(0).getAs[Long]("n_distinct")
    val approx = Profile.profile(data, Seq("k"), approxDistinct = true)
      .collect()(0).getAs[Long]("n_distinct")
    val rsd = 0.05 // approx_count_distinct default
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 3 * rsd, s"HLL err $err (exact=$exact approx=$approx)")
  }
}
