package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend — the grouped, fully
  * distributed form of [[HeavyHitters.zipfFit]]'s regression: fit
  * `y ≈ slope·x + intercept` within every group from exact BIGINT
  * sufficient statistics (n, Σx, Σy, Σx², Σxy — one map-side-combinable
  * keyed aggregate, nothing corpus-sized shuffles), then evaluate the
  * closed form in a fixed IEEE sequence and floor to micro units so both
  * engines agree bit-for-bit.
  *
  * The pipeline use: "is quality drifting with document length per
  * language", "is latency trending with batch size per source" — the
  * monitoring regression every corpus report wants, at a |groups|-row
  * output size. Inputs are LONG (micro-quantize upstream); the caller
  * owns overflow headroom: |x·y| · rows-per-group must stay under 2^63
  * (tokens ≤ 10^4 at micro-scaled y ≤ 10^6 holds to ~10^8 rows/group).
  *
  * Degenerate groups (all x equal → zero variance) report slope and
  * intercept 0 by convention — explicit, no NULL-dtype drift.
  */
object Trend {

  def groupOls(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val g = df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"))
    val denom = col("n") * col("sxx") - col("sx") * col("sx")
    val slopeD = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      denom.cast("double")
    val interceptD = col("sy").cast("double") / col("n").cast("double") -
      slopeD * (col("sx").cast("double") / col("n").cast("double"))
    g.select(col("group"), col("n"),
      when(denom === 0, lit(0L))
        .otherwise(floor(slopeD * lit(1e6)).cast("long")).as("slope_micro"),
      when(denom === 0, lit(0L))
        .otherwise(floor(interceptD).cast("long")).as("intercept_value"))
  }
}
