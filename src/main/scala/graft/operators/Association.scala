package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal–Srikant's support/
  * confidence frame, pairwise): for item pairs that co-occur in enough
  * baskets, emit support, both directed confidences, and lift — all as
  * exact integer ppm (counts and one integer division; no float
  * anywhere, so an oracle replays every cell). The classic
  * "users/documents that contain X also contain Y" analytics operator;
  * in a training-data pipeline it surfaces topic co-occurrence and
  * leakage-prone correlated sources.
  *
  * Scale shape: baskets dedupe to (basket, item) rows once; the pair
  * generation is a SELF-JOIN KEYED ON basket, so fan-out is Σ(basket
  * size²) — bounded by `maxBasketSize` (oversized baskets are dropped
  * whole, the standard cap that keeps one hot basket from quadratic
  * blowup; dropped baskets are counted out of N so supports stay
  * consistent). Item counts and the pair aggregate are combiner-
  * collapsed; `minPairCount` prunes before the rule math.
  */
object Association {

  /** (a, b, pair_n, support_ppm, conf_ab_ppm, conf_ba_ppm, lift_ppm)
    * for unordered item pairs a < b with pair_n >= minPairCount.
    * support = pair_n / N baskets; conf(a→b) = pair_n / n(a);
    * lift = pair_n · N / (n(a) · n(b)).
    */
  def pairRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L,
      maxBasketSize: Int = 256): DataFrame = {
    require(minPairCount >= 1, s"minPairCount >= 1, got $minPairCount")
    require(maxBasketSize >= 2, s"maxBasketSize >= 2, got $maxBasketSize")
    val items = df
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val kept = items
      .withColumn("bsz",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("basket")))
      .filter(col("bsz") <= maxBasketSize)
      .select("basket", "item")
      .localCheckpoint() // reused by N, item counts, and both join legs
    val n = kept.select("basket").distinct().count()
    require(n > 0, "no baskets after the size cap")
    val ic = kept.groupBy("item").agg(count(lit(1)).as("ic"))
    val pairs = kept.toDF("basket", "a")
      .join(kept.toDF("basket", "b"), "basket")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairCount)
    // the three-factor lift numerator (pair_n · N · 1e6) overflows Long
    // past ~9.2e12·N⁻¹ pair counts (e.g. 1e8 baskets × 1e5-count pair);
    // route it through decimal(38,0) — still exact integers, so the
    // oracle replay property is unchanged at any corpus scale
    pairs
      .join(ic.toDF("a", "ca"), "a")
      .join(ic.toDF("b", "cb"), "b")
      .select(col("a"), col("b"), col("pair_n"),
        expr(s"pair_n * 1000000 div ${n}L").as("support_ppm"),
        expr("pair_n * 1000000 div ca").as("conf_ab_ppm"),
        expr("pair_n * 1000000 div cb").as("conf_ba_ppm"),
        expr(s"(cast(pair_n as decimal(38,0)) * ${n}L * 1000000) div " +
          "(cast(ca as decimal(38,0)) * cb)").as("lift_ppm"))
  }
}
