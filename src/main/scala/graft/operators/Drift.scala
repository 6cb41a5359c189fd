package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus slices — the check a
  * continuously-ingesting training pipeline runs before trusting that
  * yesterday's curation thresholds still hold today (a new crawl whose
  * length / quality-score / perplexity distribution shifted will silently
  * change what every downstream gate keeps).
  *
  * Metric: Population Stability Index over equi-width bins,
  * `PSI = Σ_bins (p_ref − p_cur) · ln(p_ref / p_cur)`, the standard
  * model-monitoring drift score (PSI < 0.1 stable, 0.1–0.25 moderate,
  * > 0.25 action). Add-one smoothing over the full bin space (the
  * [[Dsir.importanceTable]] precedent) keeps empty bins finite.
  *
  * Exactness: bin edges are integer literals derived from the REFERENCE
  * side's min/max (one single-row aggregate — the calibration-report
  * precedent), counts are exact BIGINTs, and each bin's PSI term is the
  * IDENTICAL double expression floored to NANO units on both engine and
  * oracle sides — deterministic given deterministic inputs, so the result
  * is partitioning-invariant and hash-replayable.
  *
  * Scale shape: two narrow scans (column-pruned, no shuffle until the
  * |bins|-keyed aggregate with map-side combine), a bins-sized grid built
  * from spark.range, and one single-row broadcast for the total. No
  * window, no sort, no corpus-sized shuffle.
  */
object Drift {

  /** Per-bin PSI report between `ref` and `cur` on integer column
    * `valueCol`. Returns (bin, lo, n_ref, n_cur, term_nano, psi_nano):
    * `lo` the bin's inclusive lower edge, `term_nano` the bin's signed PSI
    * contribution in 1e-9 units, `psi_nano` the total (repeated — the
    * report is bins-sized, one row per bin). Out-of-range current-side
    * values clamp into the edge bins (standard PSI practice: the drift
    * OUT of the reference range is exactly what must register).
    */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100000, s"bins=$bins outside [2, 1e5]")
    val spark = ref.sparkSession
    // single-row stats: range AND total in one pass over the reference
    val r = ref.agg(min(col(valueCol)).cast("long"), max(col(valueCol)).cast("long"),
      count(col(valueCol))).head()
    require(!r.isNullAt(0), "psi: reference slice has no non-null values")
    val (mn, mx, nRef) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val nCur = cur.agg(count(col(valueCol))).head().getLong(0)
    val w = (mx - mn) / bins + 1
    def binCounts(df: DataFrame, as: String): DataFrame = df
      .select(least(greatest(
        expr(s"(CAST($valueCol AS BIGINT) - ${mn}L) div ${w}L"), lit(0L)),
        lit(bins - 1L)).as("bin"))
      .where(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as(as))
    val grid = spark.range(bins).select(col("id").as("bin"))
      .join(binCounts(ref, "cr"), Seq("bin"), "left")
      .join(binCounts(cur, "cc"), Seq("bin"), "left")
      .select(col("bin"),
        (lit(mn) + col("bin") * w).as("lo"),
        coalesce(col("cr"), lit(0L)).as("n_ref"),
        coalesce(col("cc"), lit(0L)).as("n_cur"))
      // identical double sequencing on both engine and oracle sides:
      // p = (c+1)/(N+bins), term = (pa-pb)*ln(pa/pb), floored to nanos
      .withColumn("pa",
        (col("n_ref") + lit(1)).cast("double") / lit((nRef + bins).toDouble))
      .withColumn("pb",
        (col("n_cur") + lit(1)).cast("double") / lit((nCur + bins).toDouble))
      .withColumn("term_nano",
        floor((col("pa") - col("pb")) * log(col("pa") / col("pb")) * lit(1e9))
          .cast("long"))
      .drop("pa", "pb")
      // bins-sized; two consumers (total + report rows) must not re-run
      // the two corpus scans behind it
      .localCheckpoint()
    val total = grid.agg(sum("term_nano").as("psi_nano"))
    grid.crossJoin(broadcast(total))
  }

  /** Embedding-centroid drift between a reference and a current corpus
    * slice — the SEMANTIC companion to [[psi]]'s scalar-feature drift:
    * "did the meaning of the corpus move", asked of the embedding space
    * directly. Per dimension: both slices' centroid coordinates
    * (micro-quantized integer sums, floored division — the
    * [[Profile.embeddingStats]] convention) and their delta; every row
    * also carries the two whole-corpus summary numbers, cosine between
    * the centroids and the L2 norm of the shift (exact BIGINT
    * dot-products, ONE floored double each).
    *
    * Scale shape: two posexplode → dim-keyed aggregates (map-side
    * combine collapses to d rows per partition), a d-row join, and a
    * d-row summary aggregate that broadcasts back — nothing is
    * corpus-sized after the first combine.
    */
  def semanticDrift(ref: DataFrame, cur: DataFrame): DataFrame = {
    def dimMeans(df: DataFrame, name: String): DataFrame =
      df.select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim").cast("long").as("dim"),
          round(col("v").cast("double") * lit(1e6), 0).cast("long").as("q"))
        .groupBy("dim")
        .agg(count(lit(1)).as(s"n_$name"), sum("q").as("s"))
        .select(col("dim"), col(s"n_$name"),
          floor(col("s").cast("double") / col(s"n_$name")).cast("long")
            .as(s"${name}_mean_micro"))
    val perDim = dimMeans(ref, "ref").join(dimMeans(cur, "cur"), "dim")
      .select(col("dim"), col("n_ref"), col("n_cur"),
        col("ref_mean_micro"), col("cur_mean_micro"),
        (col("cur_mean_micro") - col("ref_mean_micro")).as("delta_micro"))
      .localCheckpoint() // consumed twice: summary aggregate + output rows
    val summary = perDim.agg(
        sum(col("ref_mean_micro") * col("cur_mean_micro")).as("rc"),
        sum(col("ref_mean_micro") * col("ref_mean_micro")).as("rr"),
        sum(col("cur_mean_micro") * col("cur_mean_micro")).as("cc"),
        sum(col("delta_micro") * col("delta_micro")).as("dd"))
      .select(
        floor(col("rc").cast("double") /
          (sqrt(col("rr").cast("double")) * sqrt(col("cc").cast("double"))) * lit(1e6))
          .cast("long").as("centroid_cos_micro"),
        floor(sqrt(col("dd").cast("double"))).cast("long").as("shift_l2_micro"))
    perDim.crossJoin(broadcast(summary))
  }
}
