package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal component of an embedding corpus by distributed power
  * iteration — the embedding-QA companion to [[Profile.embeddingStats]]:
  * the dominant direction of variance exposes a collapsed/anisotropic
  * embedding space (one direction soaking up most variance is the
  * classic symptom), drives mean-centering + whitening decisions, and
  * prices how much an aggressive 1-D compression would keep. Kept to the
  * TOP component deliberately: d×d covariance assembly is O(N·d²) and
  * eigen-decomposition belongs offline; the power method needs only
  * O(N·d) per pass.
  *
  * Determinism (the oracle replays every round): components quantize to
  * micro ints (round(v·10⁶), the embeddingStats convention); the
  * per-dim mean is an exact floor; each round's row projection
  * s = Σ x̃·v and per-dim back-projection y = Σ ⌊s/10⁶⌋·x̃ are exact
  * BIGINT sums; renormalization scales y by 2²⁰/max|y| and divides by
  * the exact integer √Σŷ² — the only non-integer steps are floors of
  * double expressions whose INPUTS are exact integers, so every side
  * computes bit-identical values. Overflow bound: |y| < 2⁶³ holds to
  * ~10⁸ rows per partition-of-the-problem; past that, shard-and-average
  * or drop the projection scale by 10³ (documented, not silent).
  *
  * Scale shape: one posexplode to the long (id, dim, x̃) form,
  * checkpointed once; each round is one broadcast join against the
  * 64-row component frame + two keyed aggregates (id-keyed projection,
  * dim-keyed back-projection) with map-side combine. Driver state per
  * round: d longs. The variance summary is one more dim-keyed aggregate
  * with BigInt driver math — nothing corpus-sized ever leaves the
  * cluster.
  */
object Pca {

  /** Returns one row per dimension: (dim, mean_micro, v_micro,
    * explained_ppm) — v the unit top component after `iters` rounds
    * (micro units), explained_ppm = ⌊10⁶ · Var(x·v) / Σ_d Var(x_d)⌋ the
    * fraction of total variance the component explains (ppm).
    */
  def topComponent(vecs: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters=$iters outside [1,16]")
    val spark = vecs.sparkSession
    import spark.implicits._
    val q = vecs
      .select(col("id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("id"), col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * lit(1e6), 0).cast("long").as("q"))
    // exact per-dim sums -> integer floor mean (bounded collect: d rows)
    val dimAgg = q.groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("q").as("sq")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val d = dimAgg.length
    val n = dimAgg.head._2
    val means = dimAgg.map { case (dim, nn, sq) =>
      (dim, Math.floorDiv(sq, nn))
    }
    val meansDf = means.toSeq.toDF("dim", "mu")
    // centered long form — every round and the variance summary reread it
    val centered = q.join(broadcast(meansDf), Seq("dim"))
      .select(col("id"), col("dim"), (col("q") - col("mu")).as("x"))
      .localCheckpoint()
    // power rounds: v0 = uniform unit vector (1/sqrt(d) in micros)
    var v: Array[Long] = Array.fill(d)(math.floor(1e6 / math.sqrt(d.toDouble)).toLong)
    for (_ <- 1 to iters) {
      val vDf = v.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq.toDF("dim", "w")
      val y = centered.join(broadcast(vDf), Seq("dim"))
        .groupBy("id").agg(sum(col("x") * col("w")).as("s"))
        .select(col("id"),
          floor(col("s").cast("double") / lit(1e6)).cast("long").as("sm"))
        .join(centered, Seq("id"))
        .groupBy("dim").agg(sum(col("sm") * col("x")).as("y"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
      // renormalize on exact integers: scale to 2^20 by max|y|, then unit
      val m = y.map(math.abs).max.toDouble
      val yk = y.map(yd => math.floor(yd.toDouble * 1048576.0 / m).toLong)
      val norm = math.sqrt(yk.map(x => (BigInt(x) * BigInt(x))).sum.toDouble)
      v = yk.map(x => math.floor(x.toDouble * 1e6 / norm).toLong)
    }
    val vDf = v.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq.toDF("dim", "w")
    // explained variance: projections in MILLI units (exact floor of an
    // exact-integer-input double), then BigInt driver math for the ratio
    val pAgg = centered.join(broadcast(vDf), Seq("dim"))
      .groupBy("id").agg(sum(col("x") * col("w")).as("s"))
      .select(floor(col("s").cast("double") / lit(1e9)).cast("long").as("p"))
      .agg(count(lit(1)).as("np"), sum("p").as("sp"),
        sum(col("p") * col("p")).as("spp")).head()
    val (np, sp, spp) = (pAgg.getLong(0), pAgg.getLong(1), pAgg.getLong(2))
    val varAgg = centered.groupBy("dim")
      .agg(sum("x").as("sx"), sum(col("x") * col("x")).as("sxx")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val varTotal = varAgg.map { case (_, sx, sxx) =>
      BigInt(n) * BigInt(sxx) - BigInt(sx) * BigInt(sx)
    }.sum
    // p is milli-scale: x1e6 back to micro^2 scale before the ppm ratio
    val varP = (BigInt(np) * BigInt(spp) - BigInt(sp) * BigInt(sp)) * BigInt(1000000)
    val explainedPpm =
      if (varTotal == 0) 0L else (varP * BigInt(1000000) / varTotal).toLong
    means.zip(v).map { case ((dim, mu), w) => (dim, mu, w, explainedPpm) }
      .toSeq.toDF("dim", "mean_micro", "v_micro", "explained_ppm")
  }
}
