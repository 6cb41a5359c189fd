package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — pairs (l, r) sharing equi-keys with
  * `r.ts ∈ [l.ts - before, l.ts + after]` (inclusive bounds). Spark plans a
  * raw inequality predicate as a theta-join (per-key cross product +
  * filter), which is quadratic in key frequency; this operator makes the
  * join KEYED by conflating time into buckets of width `before + after`:
  * every right row lands in exactly one bucket, every left row probes the
  * (at most two) consecutive buckets its window can overlap, and the exact
  * range predicate filters inside the join stage. Candidate count is
  * bounded by 2x the per-bucket density — linear in data size for
  * time-uniform streams — and the shuffle is a plain hash partition on
  * (keys, bucket).
  *
  * This is the standard interval-banding technique (cf. Databricks' range
  * join optimization and Flink's interval join); AQE still handles residual
  * per-bucket skew because the join is a shuffle hash/sort-merge equi-join.
  */
object RangeJoin {

  /** Inner banded range join.
    *
    * @param left      left input
    * @param right     right input
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTs    left ordering column (integral: epoch ns/ms/s)
    * @param rightTs   right ordering column, same unit as `leftTs`
    * @param before    lookback from l.ts (>= 0), same unit as the ts cols
    * @param after     lookahead from l.ts (>= 0); before + after > 0
    * @param leftCols  left payload columns to keep (besides keys)
    * @param rightCols right payload columns to keep
    * Result: keys ++ leftCols ++ rightCols, one row per qualifying pair.
    */
  def range(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      before: Long,
      after: Long,
      leftCols: Seq[String],
      rightCols: Seq[String]): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      s"window [-$before, +$after] must be non-empty")
    val w = before + after
    // bucket key = the bucket's START offset, computed in exact long
    // arithmetic (epoch-ns values exceed double's 53-bit mantissa, so a
    // float floor()-division would misbucket); pmod keeps negatives right
    def bucket(ts: Column, shift: Long): Column = {
      val t = ts.cast("long") + lit(shift)
      t - pmod(t, lit(w))
    }
    // left probes the buckets of both window endpoints (<= 2 distinct);
    // array_distinct keeps each candidate pair generated exactly once
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__lts")) ++ leftCols.map(col) ++
        Seq(explode(array_distinct(array(
          bucket(col(leftTs), -before), bucket(col(leftTs), after))))
          .as("__bucket")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__rts"), bucket(col(rightTs), 0L)
        .as("__bucket")) ++ rightCols.map(col): _*)
    l.join(r, keys :+ "__bucket")
      .filter(col("__rts") >= col("__lts") - lit(before) &&
        col("__rts") <= col("__lts") + lit(after))
      .select(keys.map(col) ++ leftCols.map(col) ++ rightCols.map(col): _*)
  }
}
