package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build from a change log
  * (Kimball's SCD2): collapse each key's consecutive runs of identical
  * tracked-attribute values into versioned validity intervals
  * [valid_from, valid_to), with an open current interval per key. The
  * standard dimension-maintenance step of a warehouse ingest pipeline —
  * and for training-data work, the structure behind "what did this
  * entity's metadata say AT the time this example was collected"
  * point-in-time joins (the as-of family consumes its output).
  *
  * Scale shape: two windows, both partitioned by the dimension key —
  * state per task is one key's change rows, never the corpus. No joins,
  * no driver state. At 100 TB the change log shuffles once on the key
  * (same exchange serves both windows — Catalyst reuses the sort) and
  * each key's history is a few rows.
  */
object Scd2 {

  /** Versioned history: key, version (1-based per key), the tracked
    * attrs, valid_from, valid_to (null while current), is_current.
    *
    * @param log      change-log rows (one per observation)
    * @param keyCol   dimension/business key
    * @param attrs    tracked attribute columns — a new version starts
    *                 whenever ANY of them differs from the key's
    *                 previous observation (null-safe compare)
    * @param tsCol    observation time
    * @param tieCols  deterministic order within equal timestamps
    */
  def fromChangeLog(
      log: DataFrame,
      keyCol: String,
      attrs: Seq[String],
      tsCol: String,
      tieCols: Seq[String] = Seq.empty): DataFrame = {
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val ord: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val wAll = Window.partitionBy(keyCol).orderBy(ord: _*)
    // a row OPENS a version when it is the key's first observation or
    // any tracked attr differs (null-safe) from the previous one — the
    // explicit first-row test matters when the first value is ITSELF
    // null: lag's out-of-frame null would <=> it and swallow the row
    val opens = row_number().over(wAll) === 1 ||
      attrs.map(a => !(col(a) <=> lag(col(a), 1).over(wAll))).reduce(_ || _)
    val changes = log
      .withColumn("_open", opens)
      .filter(col("_open"))
    val wChg = Window.partitionBy(keyCol).orderBy(ord: _*)
    changes
      .withColumn("version", row_number().over(wChg))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wChg))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(keyCol) +: col("version") +: attrs.map(col)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Point-in-time lookup against a built history: the version of `key`
    * valid at `at` — i.e. valid_from <= at < valid_to (open current
    * interval matches everything from its valid_from on). A plain
    * filter, usable as a join condition in as-of enrichment.
    */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
