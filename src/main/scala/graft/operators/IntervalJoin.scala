package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — pairs of rows whose [start, end] intervals
  * intersect (co-presence, session collision, downtime attribution).
  *
  * The naive form is an inequality theta-join (`lStart <= rEnd AND rStart
  * <= lEnd`) — a nested-loop product at any scale. This implementation is
  * the standard bucketed decomposition:
  *
  *   1. explode every interval into the fixed-width time buckets it
  *      covers (intervals are short relative to the corpus timespan, so
  *      the explode is a small constant factor);
  *   2. equi-join on the bucket (plus any caller keys) — a keyed shuffle,
  *      never a product;
  *   3. keep a matched pair ONLY in the bucket containing the overlap's
  *      start (`floor(max(lStart, rStart) / width)`) — each true pair
  *      survives in exactly one bucket, so no distinct pass is needed;
  *   4. verify the exact overlap predicate on the bucket-collided pairs.
  *
  * Bucket width tunes the explode-vs-collision trade: width ~ the typical
  * interval length keeps both the replication factor and the per-bucket
  * population small. Pathological buckets (everything overlaps one hot
  * hour) degrade to that bucket's local product — the same skew surface
  * as any keyed join, handled by AQE/salting, not by this operator.
  */
object IntervalJoin {

  /** Overlapping pairs of `left` and `right` intervals.
    *
    * @param left   frame with (lStart, lEnd) long columns (+ payload)
    * @param right  frame with (rStart, rEnd) long columns (+ payload)
    * @param width  bucket width in the interval unit
    * @return left payload ++ right payload ++ (overlap_start, overlap_end)
    */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      width: Long): DataFrame = {
    require(width >= 1, s"need width >= 1 (got $width)")
    def buckets(s: String, e: String) =
      explode(sequence(expr(s"$s DIV ${width}L"), expr(s"$e DIV ${width}L")))
    val l = left.withColumn("__bucket", buckets(lStart, lEnd))
    val r = right.withColumn("__bucket", buckets(rStart, rEnd))
    l.join(r, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // attribute the pair to the overlap-start bucket only: exactly one
      // surviving copy per true pair, no distinct needed
      .filter(col("__bucket") === expr(s"greatest($lStart, $rStart) DIV ${width}L"))
      .withColumn("overlap_start", greatest(col(lStart), col(rStart)))
      .withColumn("overlap_end", least(col(lEnd), col(rEnd)))
      .drop("__bucket")
  }
}
