package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Oracle-replayable Count-Min sketch (Cormode & Muthukrishnan 2005) —
  * mergeable frequency estimation: d hash rows × w counters, point
  * query = min over rows, guaranteed to NEVER under-estimate and to
  * over-estimate by ≤ εN with probability 1−δ (w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  * The counting sibling of [[Hll]]'s cardinality sketch: at 100 TB the
  * sketch is d·w integers per group however many distinct keys flow
  * through, and two corpora's sketches ADD.
  *
  * Replayability stance as in [[Hll]]: row r's bucket is an md5-derived
  * 60-bit integer of "r:value" mod w — exact integer arithmetic an
  * independent SQL engine reproduces cell for cell, counters are exact
  * longs, so the oracle verifies the SKETCH, not a tolerance band.
  *
  * Scale shape: one narrow d-way explode + one (row, bucket) combiner-
  * collapsed count; estimates probe d cells per queried key.
  */
object Cms {

  /** Sparse sketch cells: (row, bucket, cnt) — one row per NON-ZERO
    * cell; absent cells are 0. `weightCol` = None counts occurrences.
    */
  def sketch(
      df: DataFrame,
      valueCol: String,
      width: Int,
      depth: Int,
      weightCol: Option[String] = None): DataFrame = {
    require(width >= 8 && depth >= 1 && depth <= 8,
      s"need width >= 8, depth 1..8; got $width x $depth")
    val rows = df
      .select(col(valueCol).cast("string").as("v"),
        weightCol.map(col(_).cast("long")).getOrElse(lit(1L)).as("wt"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col("v"), col("wt"))
      .withColumn("bucket",
        expr(s"cast(conv(substring(md5(concat(cast(row as string), ':', v)), 1, 15), 16, 10) as bigint) % $width"))
    rows.groupBy("row", "bucket")
      .agg(sum(col("wt")).as("cnt"))
  }

  /** Sum two sketches of identical (width, depth): cells add. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket")
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `keys`: (key, est) = min over the d probed
    * cells (missing cell = 0). `keys` is a serving-bounded literal list —
    * the broadcast-probe side, like every shortlist here.
    */
  def estimate(
      sketchDf: DataFrame,
      keys: Seq[String],
      width: Int,
      depth: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one key to probe")
    val spark = sketchDf.sparkSession
    import spark.implicits._
    val probes = keys.distinct
      .flatMap(k => (0 until depth).map(r => (k, r)))
      .toDF("key", "row")
      .withColumn("bucket",
        expr(s"cast(conv(substring(md5(concat(cast(row as string), ':', key)), 1, 15), 16, 10) as bigint) % $width"))
    broadcast(probes)
      .join(sketchDf, Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
