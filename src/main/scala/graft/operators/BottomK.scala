package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bottom-k set signatures (Cohen & Kaplan's bottom-k sketches; the
  * one-permutation cousin of MinHash): per group, the k SMALLEST
  * md5-derived hashes of its distinct values. Corpus-level similarity
  * without corpus-level joins — the standard answer to "how much do
  * these two sources overlap" at 100 TB, where exact pairwise Jaccard
  * over sources means joining every pair's full vocabularies.
  *
  * Estimator: for groups A, B, take the k smallest hashes of the UNION
  * of their signatures; Jaccard ≈ |those also in both| / |those
  * considered|. Every step is deterministic integer arithmetic over
  * md5-derived hashes, so a SQL oracle replays signatures AND estimates
  * exactly (ppm integers, no float tolerance) — same audit stance as
  * [[Hll]]/[[Cms]].
  *
  * Scale shape: one distinct + one keyed bounded window (WindowGroupLimit
  * heap) builds the signatures; estimation touches only signature rows
  * (groups × k), with the tiny group-pair frame broadcast.
  */
object BottomK {

  /** Per-group signature: (grp, h) — the k smallest distinct hashes. */
  def signatures(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val w = Window.partitionBy("grp").orderBy("h")
    df.select(col(groupCol).as("grp"),
        expr(s"cast(conv(substring(md5(cast($valueCol as string)), 1, 15), 16, 10) as bigint)")
          .as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("grp", "h")
  }

  /** Pairwise Jaccard estimates between all group pairs (grp_a < grp_b
    * in string order): (grp_a, grp_b, k_used, inter, est_ppm) where the
    * estimate counts, among the k smallest union hashes, those present
    * in BOTH signatures — exact integers end to end.
    */
  def jaccardEstimates(sigs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val groups = sigs.select(col("grp")).distinct()
    val pairs = groups.select(col("grp").as("grp_a"))
      .crossJoin(groups.select(col("grp").as("grp_b")))
      .filter(col("grp_a") < col("grp_b"))
    val uniW = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    broadcast(pairs)
      .join(sigs, col("grp") === col("grp_a") || col("grp") === col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("h"),
        (col("grp") === col("grp_a")).cast("int").as("in_a"),
        (col("grp") === col("grp_b")).cast("int").as("in_b"))
      .groupBy("grp_a", "grp_b", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .withColumn("rn", row_number().over(uniW))
      .filter(col("rn") <= k)
      .groupBy("grp_a", "grp_b")
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("inter"))
      .withColumn("est_ppm", expr("inter * 1000000 div k_used"))
  }
}
