package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier ranking-quality evaluation over corpus-sized score frames.
  *
  * The quality-classifier family ([[QualityClassifier]], its calibration
  * report) answers "are the probabilities honest"; AUC answers the prior
  * question a selection pipeline actually depends on: does ranking by the
  * score order kept-documents above dropped ones at every threshold
  * (the mixture fill and the streaming gate both consume the score only
  * through its order). The reference engine has no evaluation operator —
  * this is pipeline-extension breadth next to q_classifier_calibration.
  *
  * Exactness: AUC is computed in its tie-aware rank form
  * `AUC = Σ_m np(m)·(below(m) + nn(m)/2) / (P·N)` over DISTINCT margin
  * values m (np/nn = positives/negatives at m, below = negatives strictly
  * under m). Everything is BIGINT: the half is cleared by carrying
  * `2·below + nn`, and the final division is a single integer floor-div to
  * micro-units — no float anywhere, so the result is bit-stable under any
  * partitioning and replayable in a SQL oracle.
  *
  * Scale shape: a global cumulative count is an order statistic, and the
  * naive form is one corpus-wide sort (unpartitioned window — banned in
  * this engine). Here it is the bucket-sliced distributed prefix sum of
  * [[Pack.packOffsets]]: margins collapse to a distinct-value frame (one
  * keyed agg with map-side combine), value-derived equi-width buckets give
  * contiguous ranges, per-bucket negative subtotals prefix-sum on the
  * driver (state = `buckets` longs), and the within-bucket cumulative runs
  * in a window PARTITIONED by bucket. One shuffle over the distinct-margin
  * frame (already ≪ corpus), bounded driver state, no global sort.
  */
object Eval {

  /** Exact tie-aware AUC (and Gini = 2·AUC − 1) of an integer score column
    * against a 0/1 label column. Returns ONE row:
    * (n_pos, n_neg, n_margins, auc_micro, gini_micro); auc/gini are null
    * when either class is empty (AUC undefined).
    *
    * Caller contract: `marginCol` LONG (micro-quantized scores — float
    * scores must be quantized first, the engine-wide convention), `posCol`
    * 0/1. At ~3e9 rows per class `P·N` overflows BIGINT; shard by group
    * and average, or quantile-bin the margins first.
    */
  def aucExact(
      scored: DataFrame,
      marginCol: String = "margin_micro",
      posCol: String = "pos",
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20),
      s"buckets=$buckets outside [1, 2^20] (driver holds the prefix sums)")
    val spark = scored.sparkSession
    import spark.implicits._
    // distinct-margin frame: 3 consumers (range stats, subtotals, final
    // aggregate) — materialize once so the upstream (often a full
    // training+scoring chain) runs once
    val dist = scored
      .groupBy(col(marginCol).as("m"))
      .agg(sum(col(posCol)).cast("long").as("np"),
        (count(lit(1)) - sum(col(posCol))).cast("long").as("nn"))
      .localCheckpoint()
    // single-row range aggregate: bin edges must be literals so the bucket
    // expression stays a narrow map (the calibration-report precedent)
    val r = dist.agg(min("m"), max("m"), count(lit(1))).head()
    if (r.isNullAt(0)) // empty input: one all-null/zero row, schema stable
      return Seq((0L, 0L, 0L)).toDF("n_pos", "n_neg", "n_margins")
        .select(col("n_pos"), col("n_neg"), col("n_margins"),
          lit(null).cast("long").as("auc_micro"),
          lit(null).cast("long").as("gini_micro"))
    val (mn, mx, nm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val w = (mx - mn) / buckets + 1
    val bucketed = dist
      .withColumn("__bucket", expr(s"CAST((m - ${mn}L) div ${w}L AS INT)"))
    // B rows max — bounded by the bucket count, never the data
    val subtotals = bucketed.groupBy("__bucket")
      .agg(sum("nn").as("s")).collect()
      .map(x => (x.getInt(0), x.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = subtotals.map { case (b, s) =>
      val off = acc; acc += s; (b, off)
    }.toSeq.toDF("__bucket", "__off")
    val withinBucket = Window.partitionBy("__bucket").orderBy("m")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("below",
        col("__off") + coalesce(sum(col("nn")).over(withinBucket), lit(0L)))
      .agg(sum("np").as("p"), sum("nn").as("n"),
        sum(col("np") * (col("below") * 2L + col("nn"))).as("num2"))
      .select(col("p").as("n_pos"), col("n").as("n_neg"),
        lit(nm).as("n_margins"),
        when(col("p") > 0 && col("n") > 0,
          expr("(num2 * 1000000L) div (2L * p * n)")).as("auc_micro"),
        when(col("p") > 0 && col("n") > 0,
          expr("(num2 * 1000000L) div (p * n) - 1000000L")).as("gini_micro"))
  }
}
