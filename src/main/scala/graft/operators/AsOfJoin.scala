package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right
  * row with the same key and `right.ts <= left.ts` (inclusive; DuckDB
  * `ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts` semantics). Spark has
  * no native as-of operator; the naive formulation is an inequality
  * theta-join (quadratic per key, unusable at scale).
  *
  * Implementation is the UNION + ORDERED WINDOW shape: tag both inputs,
  * union them, and carry the latest right-side payload forward with
  * `last(..., ignoreNulls)` over a (key, ts)-ordered running window. Cost
  * is ONE shuffle on the key plus a per-key sort — the same cost as any
  * keyed window — and is independent of how many right rows precede each
  * left row (the inequality-join candidate count never materializes).
  * At equal timestamps the right row sorts first (side 0 < side 1), which
  * yields the inclusive `<=` match.
  *
  * Skew: all rows of one key land in one task, as with any
  * window/sessionization; pathological hot keys get the standard
  * treatment (split the key by time range, overlap by the lookback
  * horizon) upstream of this operator.
  */
object AsOfJoin {

  /** Inner backward as-of join.
    *
    * @param left       left input
    * @param right      right input
    * @param keys       equi-join key columns (present on both sides)
    * @param leftTs     left ordering column (numeric/timestamp)
    * @param rightTs    right ordering column, same type as `leftTs`
    * @param leftCols   left payload columns to keep (besides keys)
    * @param rightCols  right payload columns to emit for the matched row
    * @param rightTieBreak extra right-side ordering columns: when several
    *                   right rows share (key, ts), the LAST one in this
    *                   ordering wins (deterministic match)
    * Result columns: keys ++ leftCols ++ rightCols.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      leftCols: Seq[String],
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val rFields = (rightCols ++ rightTieBreak).distinct
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast(structType(right, rFields)).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rFields.map(col): _*).as("__r")): _*)
    // ties within (key, ts, side): order right rows by the tie-break so
    // last() picks a deterministic winner; left rows don't need one (each
    // produces its own output row)
    val ord: Seq[Column] = col("__ts").asc +: col("__side").asc +:
      rightTieBreak.map(c => col("__r").getField(c).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select(keys.map(col) ++ leftCols.map(col) ++
        rightCols.map(c => col("__match").getField(c).as(c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))
}
