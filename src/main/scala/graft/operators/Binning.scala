package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Equal-frequency (quantile) discretization of a long-valued feature —
  * the feature-engineering primitive behind "decile of document length",
  * perplexity buckets with exact boundaries, or stratified-by-quantile
  * mixing.
  *
  * bin(v) = floor(rows-strictly-below-v * nBins / N): ties (equal values)
  * land in one bin by construction, so the assignment is deterministic on
  * any partitioning and replayable in SQL. Bins are equal-frequency up to
  * tie granularity (a value spanning a cut keeps its whole tie group).
  *
  * Scale shape: the distribution lives in the VALUE-COUNT table (distinct
  * values — for lengths/scores, orders of magnitude below the corpus).
  * Its exclusive prefix sum runs Pack-style (coarse value-range buckets →
  * driver cumsum of B longs → in-bucket PARTITIONED window), then the
  * value→bin map joins back to the corpus as a broadcast. No corpus sort
  * anywhere.
  */
object Binning {

  /** Assign each row its equal-frequency bin. Input needs a long `value`
    * column; output = input + (bin: long).
    *
    * @param span value-range width of one coarse prefix-sum bucket
    */
  def equalFrequency(df: DataFrame, nBins: Int, span: Long = 1 << 16): DataFrame = {
    require(nBins >= 1, s"need nBins >= 1 (got $nBins)")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col("value")).agg(count(lit(1)).as("c"))
      .withColumn("vbucket", expr(s"value DIV ${span}L"))
      .localCheckpoint()
    val subtotals = counts.groupBy("vbucket").agg(sum("c").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val n = subtotals.map(_._2).sum
    val bases = subtotals.map { case (b, s) => val off = acc; acc += s; (b, off) }
    val baseDf = broadcast(bases.toSeq.toDF("vbucket", "vbase"))
    val inBucket = Window.partitionBy("vbucket").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bins = counts.join(baseDf, "vbucket")
      .withColumn("below", col("vbase") + coalesce(sum("c").over(inBucket), lit(0L)))
      .withColumn("bin", expr(s"below * ${nBins}L DIV ${n}L"))
      .select("value", "bin")
    df.join(broadcast(bins), Seq("value"))
  }

  /** Per-bin report: count, value bounds, mean in exact integer micro
    * units (floored — engine-agnostic, no decimal-division scale rules).
    */
  def report(df: DataFrame, nBins: Int): DataFrame =
    equalFrequency(df, nBins)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min("value").as("v_min"), max("value").as("v_max"),
        expr("sum(value) * 1000000L DIV count(1)").as("v_mean_micro"))
      .orderBy("bin")
}
