package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-arm experiment readout — the A/B-test analysis a telemetry
  * pipeline runs before shipping a ranking/model change: per-arm
  * conversion counts, exact micro rates, and the pooled two-proportion
  * z statistic. (Assignment itself is the caller's: any deterministic
  * unit → arm mapping, typically hash parity — the [[Sampling]] gate
  * convention — so assignment is reproducible on any partitioning.)
  *
  * Exactness: counts and micro rates are exact BIGINT arithmetic; the z
  * statistic is ONE floored double expression over exact integer inputs
  * (pooled p̂ = (c1+c2)/(n1+n2), z = (p1−p2)/√(p̂(1−p̂)(1/n1+1/n2))),
  * so both engine and oracle compute bit-identical milli-z.
  *
  * Scale shape: one keyed per-unit aggregate (map-side combine collapses
  * each unit's events), then a 2-row arm aggregate and a single-row
  * projection. No window, no collect, no corpus shuffle beyond the
  * unit-keyed one.
  */
object Experiment {

  /** `units`: one row per experiment unit with (arm ∈ {0,1},
    * converted ∈ {0,1}). Returns ONE row: (n_0, n_1, conv_0, conv_1,
    * rate_0_micro, rate_1_micro, lift_micro, z_milli) — z_milli null
    * when either arm is empty or the pooled variance is zero.
    */
  def abTest(units: DataFrame): DataFrame =
    units
      .groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("converted").as("c"))
      .agg(
        sum(when(col("arm") === 0, col("n")).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, col("n")).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("c1"))
      .select(
        col("n0").as("n_0"), col("n1").as("n_1"),
        col("c0").as("conv_0"), col("c1").as("conv_1"),
        when(col("n0") > 0, expr("(c0 * 1000000L) div n0")).as("rate_0_micro"),
        when(col("n1") > 0, expr("(c1 * 1000000L) div n1")).as("rate_1_micro"),
        when(col("n0") > 0 && col("n1") > 0,
          expr("(c1 * 1000000L) div n1 - (c0 * 1000000L) div n0")).as("lift_micro"),
        when(col("n0") > 0 && col("n1") > 0 &&
          col("c0") + col("c1") > 0 && col("c0") + col("c1") < col("n0") + col("n1"),
          floor(
            (col("c1").cast("double") / col("n1").cast("double") -
              col("c0").cast("double") / col("n0").cast("double")) /
            sqrt(((col("c0") + col("c1")).cast("double") /
                   (col("n0") + col("n1")).cast("double")) *
                 (lit(1.0) - (col("c0") + col("c1")).cast("double") /
                   (col("n0") + col("n1")).cast("double")) *
                 (lit(1.0) / col("n0").cast("double") +
                   lit(1.0) / col("n1").cast("double")))
            * lit(1000)).cast("long")).as("z_milli"))
}
