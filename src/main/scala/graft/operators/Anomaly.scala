package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Telemetry anomaly detection over the events stream — the ops-side
  * companion to [[Drift]]'s corpus-side monitoring: flag (event_type,
  * day, hour) buckets whose volume deviates from that hour-of-day's
  * historical norm. Seasonal baseline per (type, hour-of-day) rather
  * than a global mean, so the 3 am lull doesn't mask a 3 am error spike.
  *
  * Exactness: the z-score is computed from exact integer sufficient
  * statistics only — `dev = n·x − Σx` and `var_num = n·Σx² − (Σx)²`
  * (population variance numerator scaled by n²), giving
  * `z = dev / √var_num`. The single sqrt/division runs on exact integer
  * inputs, so the double result is bit-deterministic and the floored
  * milli-z replays in a SQL oracle.
  *
  * Zero-filling matters: an hour with NO events is the strongest anomaly
  * of all and would vanish from a naive groupBy. The (type × day × hour)
  * grid is built from two tiny distinct frames (types are bounded by the
  * product's event taxonomy, days by the retention window) broadcast
  * into nested-loop expansion — never a corpus-sized cartesian.
  *
  * Scale shape: one keyed count over the events scan (map-side combine),
  * then everything downstream is grid-sized (|types|·|days|·24). Two
  * keyed aggregates, broadcast joins, no window, no collect.
  */
object Anomaly {

  /** Per-bucket hourly z-scores. `events`: (event_type, ts_ms epoch
    * millis). Returns (event_type, day, hour, cnt, n_days, sum_cnt,
    * z_milli) for every grid bucket with positive variance; `day` is the
    * epoch day index, `z_milli = ⌊1000·(n·x − Σx)/√(n·Σx² − (Σx)²)⌋`.
    * Callers threshold (|z| ≥ 2000–3000) or rank by |z|.
    */
  def hourlyZScores(events: DataFrame): DataFrame = {
    val counts = events
      .select(col("event_type"),
        expr("ts_ms div 86400000").as("day"),
        expr("(ts_ms div 3600000) % 24").as("hour"))
      .groupBy("event_type", "day", "hour")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // 3 consumers: types, days, the grid join
    val types = counts.select("event_type").distinct()
    val days = counts.select("day").distinct()
    val hours = counts.sparkSession.range(24).select(col("id").as("hour"))
    val grid = types
      .crossJoin(broadcast(days))
      .crossJoin(broadcast(hours))
      .join(counts, Seq("event_type", "day", "hour"), "left")
      .select(col("event_type"), col("day"), col("hour"),
        coalesce(col("c"), lit(0L)).as("cnt"))
    val stats = grid.groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n_days"), sum("cnt").as("sx"),
        sum(col("cnt") * col("cnt")).as("sxx"))
    grid.join(stats, Seq("event_type", "hour"))
      .withColumn("dev", col("n_days") * col("cnt") - col("sx"))
      .withColumn("var_num", col("n_days") * col("sxx") - col("sx") * col("sx"))
      .filter(col("var_num") > 0)
      .select(col("event_type"), col("day"), col("hour"), col("cnt"),
        col("n_days"), col("sx").as("sum_cnt"),
        floor(col("dev").cast("double") / sqrt(col("var_num").cast("double"))
          * lit(1000)).cast("long").as("z_milli"))
  }

  /** Seasonal-naive predictability report (Hyndman & Koehler 2006's MASE
    * frame): per series, the mean absolute error of the seasonal-naive
    * forecast ŷ(t) = y(t−season) against the one-step-naive baseline
    * ŷ(t) = y(t−1), as the exact integer ratio
    * mase_ppm = (Σ|seasonal err| · n₁ · 10⁶) div (Σ|naive err| · nₛ).
    * mase < 1e6 ⇒ the seasonality is real signal; ≫ 1e6 ⇒ the series
    * drifts faster than its season repeats. The triage that decides
    * which series deserve a real forecasting model — and which metrics'
    * "anomalies" are just un-modeled seasonality.
    *
    * Input: one value per (series, period) — pre-aggregate first (e.g.
    * hourly counts). Scale shape: two lag windows partitioned by series
    * over one exchange + one keyed aggregate; missing periods are NOT
    * filled (lags are row-wise over observed periods, the standard
    * discrete-index MASE).
    */
  def seasonalNaive(
      df: DataFrame,
      seriesCol: String,
      periodCol: String,
      valueCol: String,
      season: Int): DataFrame = {
    require(season >= 2, s"season >= 2, got $season")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(seriesCol).orderBy(periodCol)
    val v = col(valueCol).cast("long")
    df
      .withColumn("__s", abs(v - lag(v, season).over(w)))
      .withColumn("__n", abs(v - lag(v, 1).over(w)))
      .groupBy(col(seriesCol).as("series"))
      .agg(count(lit(1)).as("n_periods"),
        count(col("__s")).as("n_seasonal"),
        coalesce(sum(col("__s")), lit(0L)).as("sum_abs_seasonal"),
        count(col("__n")).as("n_naive"),
        coalesce(sum(col("__n")), lit(0L)).as("sum_abs_naive"))
      .withColumn("mase_ppm",
        // decimal(38,0) route: the 3-factor numerator overflows Long once
        // Σ|err|·n passes ~9.2e12; div on decimals is still exact-integer
        when(col("sum_abs_naive") === 0 || col("n_seasonal") === 0, lit(-1L))
          .otherwise(expr(
            "(cast(sum_abs_seasonal as decimal(38,0)) * n_naive * 1000000)" +
              " div (cast(sum_abs_naive as decimal(38,0)) * n_seasonal)")))
  }

  /** Robust per-group outlier report via the median/MAD modified z-score
    * (Iglewicz & Hoaglin 1993): a value is an outlier when
    * |x − median| > k · 1.4826 · MAD — immune to the outliers themselves
    * in a way mean/stddev z-scores are not (each extreme value drags the
    * mean toward itself). Output: (group, n, med, mad, n_outliers,
    * outlier_ppm).
    *
    * Scale shape: three keyed aggregates (median, MAD, the flag count)
    * with the group-count-sized median/MAD frames broadcast back. Exact
    * `percentile` sorts per group — fine to ~10^8 rows/group, same
    * adjudication as [[Profile.percentiles]]; swap its approx form in
    * for monster groups.
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 3.5): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(groupCol).as("group"))
      .agg(percentile(v, lit(0.5)).as("med"))
    val withMed = df.select(col(groupCol).as("group"), v.as("__v"))
      .join(broadcast(med), "group")
    val mad = withMed.groupBy("group")
      .agg(percentile(abs(col("__v") - col("med")), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), "group")
      .withColumn("__out",
        (abs(col("__v") - col("med")) >
          lit(k) * lit(1.4826) * col("mad")).cast("long"))
      .groupBy("group")
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(col("__out")).as("n_outliers"))
      .withColumn("outlier_ppm", expr("n_outliers * 1000000 div n"))
  }
}
