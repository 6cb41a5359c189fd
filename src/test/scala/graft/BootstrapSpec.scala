package graft

import org.apache.spark.sql.functions._
import graft.operators.Bootstrap

/** Poisson bootstrap: weight distribution, CI sanity, partitioning
  * invariance.
  */
class BootstrapSpec extends SparkSpec {

  private def rows = {
    import spark.implicits._
    (0 until 500).map(i => (i.toLong, (i % 37).toLong)).toDF("id", "v")
  }

  test("hash weights are Poisson(1)-shaped") {
    import spark.implicits._
    val w = (0 until 2000).map(_.toLong).toDF("id")
      .select(Bootstrap.weight(col("id"), lit(0L)).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Poisson(1): P(0)=P(1)=.368, P(2)=.184 — allow generous sampling slack
    assert(math.abs(w.getOrElse(0L, 0L) - 736) < 120, s"w0=${w.get(0L)}")
    assert(math.abs(w.getOrElse(1L, 0L) - 736) < 120, s"w1=${w.get(1L)}")
    assert(math.abs(w.getOrElse(2L, 0L) - 368) < 100, s"w2=${w.get(2L)}")
    assert(w.keys.forall(k => k >= 0 && k <= 6))
  }

  test("CI brackets the point estimate and replays across partitionings") {
    val a = Bootstrap.meanCi(rows, "id", "v", b = 32).head()
    assert(a.getLong(0) == 32 && a.getLong(1) == 500)
    val (p, lo, hi) = (a.getLong(2), a.getLong(3), a.getLong(4))
    assert(lo <= p && p <= hi, s"CI [$lo, $hi] does not bracket $p")
    assert(hi > lo, "degenerate CI")
    // resample noise of a mean of ~500 uniform-ish values: interval is
    // narrow relative to the mean but not collapsed
    assert((hi - lo).toDouble / p < 0.5)
    val b = Bootstrap.meanCi(rows.repartition(7), "id", "v", b = 32).head()
    assert(a.toSeq == b.toSeq, "partitioning changed the bootstrap")
  }
}
