package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data skipping for
  * tables queried on more than one column (the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).
  *
  * A table range-partitioned and sorted by ONE column prunes on that
  * column only. Interleaving the bits of two (or more) columns into one
  * sort key makes every contiguous key range a small bounding box in BOTH
  * dimensions, so Parquet per-file/rowgroup min-max stats prune scans on
  * either column — the 100 TB answer to "we filter by user AND by time".
  *
  * [[zValue]] is pure codegen'd arithmetic (a fold over bit positions —
  * no UDF); the write path is `repartitionByRange(zCol)` +
  * `sortWithinPartitions(zCol)` + parquet, all built-ins. [[boxReport]]
  * quantifies the layout: per z-range bucket, the bounding box of both
  * source dimensions — the tighter the boxes, the better the skipping.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Values are
    * masked to `bits` bits first, so out-of-range inputs degrade to
    * collisions, never to corrupt keys. bits <= 31 keeps the z-value in
    * a positive long.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits outside [1, 31]")
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    def sl(v: Column, n: Column) = call_function("shiftleft", v, n.cast("int"))
    def sr(v: Column, n: Column) = call_function("shiftright", v, n.cast("int"))
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, i) =>
        acc
          + sl(sr(xm, i).bitwiseAND(lit(1L)), i * 2)
          + sl(sr(ym, i).bitwiseAND(lit(1L)), i * 2 + 1))
  }

  /** Layout quality report: bucket the z-curve into `buckets` contiguous
    * ranges and report each bucket's row count and per-dimension bounding
    * box. One keyed aggregate — the report is bucket-sized.
    */
  def boxReport(df: DataFrame, x: Column, y: Column, bits: Int, buckets: Int): DataFrame = {
    require(buckets >= 1, s"need buckets >= 1 (got $buckets)")
    val zBits = 2 * bits
    val log2Buckets =
      if (buckets == 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(buckets.toLong - 1)
    val shift = math.max(0, zBits - log2Buckets)
    val withZ = df
      .withColumn("__x", x.cast("long"))
      .withColumn("__y", y.cast("long"))
      .withColumn("__z", zValue(col("__x"), col("__y"), bits))
    withZ
      .withColumn("z_bucket", expr(s"__z DIV ${1L << shift}L"))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n"),
        min("__x").as("x_min"), max("__x").as("x_max"),
        min("__y").as("y_min"), max("__y").as("y_max"))
  }
}
