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
      rightTieBreak: Seq[String] = Nil): DataFrame =
    asofImpl(left, right, keys, leftTs, rightTs, leftCols, rightCols,
      rightTieBreak, forward = false)

  /** FORWARD as-of join: for each left row, the single EARLIEST right row
    * with the same key and `right.ts >= left.ts` (inclusive) — the
    * "next event after" direction (pandas merge_asof direction='forward').
    * Same union + ordered window, scanned in DESCENDING time: the running
    * `last(ignoreNulls)` then carries the nearest FOLLOWING right row.
    * Among right rows sharing (key, ts), the FIRST in `rightTieBreak`
    * order wins (mirror of the backward join's last-wins).
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      leftCols: Seq[String],
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame =
    asofImpl(left, right, keys, leftTs, rightTs, leftCols, rightCols,
      rightTieBreak, forward = true)

  /** NEAREST as-of join (pandas merge_asof direction='nearest'): for each
    * left row, whichever of its backward and forward matches sits closer
    * in time; equidistant ties go BACKWARD (the conservative "already
    * happened" choice). Two ordered-window passes + a per-left-row argmin
    * — still no inequality theta-join. Requires a unique `leftId` column
    * to identify left rows across the two passes, `leftTs` in `leftCols`
    * and `rightTs` in `rightCols` (the delta is computed from the output).
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      leftId: String,
      leftCols: Seq[String],
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(leftCols.contains(leftId) && leftCols.contains(leftTs),
      s"leftCols must carry leftId=$leftId and leftTs=$leftTs")
    require(rightCols.contains(rightTs), s"rightCols must carry rightTs=$rightTs")
    val b = asof(left, right, keys, leftTs, rightTs, leftCols, rightCols, rightTieBreak)
      .withColumn("__dir", lit(0))
      .withColumn("__delta", col(leftTs) - col(rightTs))
    val f = asofForward(left, right, keys, leftTs, rightTs, leftCols, rightCols, rightTieBreak)
      .withColumn("__dir", lit(1))
      .withColumn("__delta", col(rightTs) - col(leftTs))
    val w = Window.partitionBy(col(leftId))
      .orderBy(col("__delta").asc, col("__dir").asc)
    b.unionByName(f)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__dir", "__delta", "__rn")
  }

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      leftCols: Seq[String],
      rightCols: Seq[String],
      rightTieBreak: Seq[String],
      forward: Boolean): DataFrame = {
    val rFields = (rightCols ++ rightTieBreak).distinct
    // SQL equi-join semantics: a null key never matches (the window would
    // otherwise group null keys together and "match" them)
    val keysNotNull = keys.map(col(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true))
    val l = left.filter(keysNotNull).select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast(structType(right, rFields)).as("__r")): _*)
    val r = right.filter(keysNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rFields.map(col): _*).as("__r")): _*)
    // ties within (key, ts, side): order right rows by the tie-break so
    // last() picks a deterministic winner; left rows don't need one (each
    // produces its own output row). Forward scans time DESC (the mirror),
    // with the tie-break reversed so the winner is the FIRST in tie order.
    val tsOrd = if (forward) col("__ts").desc else col("__ts").asc
    val tieOrd = rightTieBreak.map(c =>
      if (forward) col("__r").getField(c).desc else col("__r").getField(c).asc)
    val ord: Seq[Column] = tsOrd +: col("__side").asc +: tieOrd
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

  /** Skew-bounded as-of join — identical results to [[asof]], but no task
    * ever sorts more than one (key, time-chunk) of data. [[asof]] puts a
    * key's ENTIRE history in one task (fine for billions of small keys,
    * quadratic pain for a hot key); here:
    *
    *   1. chunk-local pass: the same union+window, partitioned by
    *      (key, chunk) — bounded by chunk density;
    *   2. carry summaries: the last right row of each (key, chunk) (one
    *      row per non-empty chunk), then a cumulative window over the
    *      SUMMARIES per key — sequential per key but over #chunks rows,
    *      not #rows — yields each chunk's carry-in (latest right row of
    *      any earlier chunk);
    *   3. left rows with no chunk-local match take their chunk's carry-in
    *      via a keyed join on (key, chunk).
    *
    * `chunk` is in the ts column's unit. Right tie-break columns must be
    * orderable (the summary pass ranks by (ts, tieBreak...)).
    */
  def asofChunked(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      leftCols: Seq[String],
      rightCols: Seq[String],
      chunk: Long,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(chunk > 0, s"chunk $chunk must be positive")
    val rFields = (rightCols ++ rightTieBreak).distinct
    def chunkOf(ts: Column): Column = {
      val t = ts.cast("long")
      (t - pmod(t, lit(chunk))).as("__chunk")
    }
    val keysNotNull = keys.map(col(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true))
    val l = left.filter(keysNotNull).select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), chunkOf(col(leftTs)), lit(1).as("__side")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast(structType(right, rFields)).as("__r")): _*)
    val r = right.filter(keysNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), chunkOf(col(rightTs)), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rFields.map(col): _*).as("__r")): _*)
    val ord: Seq[Column] = col("__ts").asc +: col("__side").asc +:
      rightTieBreak.map(c => col("__r").getField(c).asc)
    // 1. chunk-local last-carry (bounded per-task work)
    val localW = Window.partitionBy((keys :+ "__chunk").map(col): _*)
      .orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, 0)
    val localMatched = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(localW))
      .filter(col("__side") === 1)
    // 2. per-(key, chunk) last right row -> cumulative carry over summaries
    val summaryRankW = Window.partitionBy((keys :+ "__chunk").map(col): _*)
      .orderBy(col("__ts").desc +:
        rightTieBreak.map(c => col("__r").getField(c).desc): _*)
    val chunkLast = r
      .withColumn("__rn", row_number().over(summaryRankW))
      .filter(col("__rn") === 1)
      .select((keys :+ "__chunk").map(col) :+ col("__r").as("__last"): _*)
    // summaries must cover chunks that hold only LEFT rows too — their
    // carry-in is the latest right row of any earlier chunk
    val allChunks = l.select((keys :+ "__chunk").map(col): _*)
      .unionByName(r.select((keys :+ "__chunk").map(col): _*)).distinct()
    val carryW = Window.partitionBy(keys.map(col): _*).orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = allChunks
      .join(chunkLast, keys :+ "__chunk", "left")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(carryW))
      .select((keys :+ "__chunk").map(col) :+ col("__carry"): _*)
    // 3. unmatched left rows take the carry-in of their chunk
    localMatched
      .join(carryIn, keys :+ "__chunk", "left")
      .withColumn("__final", coalesce(col("__match"), col("__carry")))
      .filter(col("__final").isNotNull)
      .select(keys.map(col) ++ leftCols.map(col) ++
        rightCols.map(c => col("__final").getField(c).as(c)): _*)
  }
}
