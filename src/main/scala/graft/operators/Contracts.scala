package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract checks — the Deequ-style quality gate a pipeline runs
  * before promoting a batch: declared expectations evaluated in ONE
  * corpus pass, reported as (check, metric_ppm, min_ppm, pass).
  *
  * Every check folds to a conditional COUNT over the same scan — adding a
  * check adds a column to one combiner-collapsed aggregation, never a
  * pass (uniqueness adds a distinct aggregate to the same job). The
  * single result row's counts convert to exact integer parts-per-million
  * on the driver (Long arithmetic — no double rounding at any corpus
  * size).
  */
object Contracts {

  sealed trait Check { def name: String }

  /** Fraction of non-null values in `col` must be >= minPpm. */
  final case class Complete(col: String, minPpm: Long) extends Check {
    def name = s"complete($col)"
  }

  /** Fraction of rows satisfying `cond` must be >= minPpm. */
  final case class Satisfies(label: String, cond: Column, minPpm: Long) extends Check {
    def name = s"satisfies($label)"
  }

  /** Fraction of DISTINCT values of `col` over rows must be >= minPpm
    * (1e6 = fully unique).
    */
  final case class Unique(col: String, minPpm: Long) extends Check {
    def name = s"unique($col)"
  }

  /** Evaluate all checks; returns (check, metric_ppm, min_ppm, pass)
    * sorted by check name.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val numerators: Seq[(String, Column, Long)] = checks.map {
      case Complete(c, t) =>
        (s"complete($c)", sum(when(col(c).isNotNull, 1L).otherwise(0L)), t)
      case Satisfies(l, cond, t) =>
        (s"satisfies($l)", sum(when(cond, 1L).otherwise(0L)), t)
      case Unique(c, t) =>
        (s"unique($c)", count_distinct(col(c)), t)
    }
    val agg = df.agg(count(lit(1)).as("n"),
      numerators.zipWithIndex.map { case ((_, c, _), i) =>
        coalesce(c, lit(0L)).as(s"m$i")
      }: _*)
    val row = agg.collect()(0)
    val n = math.max(1L, row.getLong(0)) // empty frame: every metric 0 ppm
    val spark = df.sparkSession
    import spark.implicits._
    numerators.zipWithIndex.map { case ((name, _, t), i) =>
      val ppm = row.getLong(i + 1) * 1000000L / n
      (name, ppm, t, ppm >= t)
    }.toDF("check", "metric_ppm", "min_ppm", "pass")
      .orderBy("check")
  }
}
