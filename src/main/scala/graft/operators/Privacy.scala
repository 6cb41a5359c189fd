package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk audit for training corpora: k-anonymity and l-diversity
  * over quasi-identifier (QI) columns (Sweeney 2002, "k-anonymity: a
  * model for protecting privacy"; Machanavajjhala 2007 for l-diversity).
  *
  * A row is re-identifiable when its QI combination is shared by fewer
  * than k rows; a QI class leaks its sensitive attribute outright when
  * every member shares one value (l = 1). The audit is what a release
  * gate consumes: per candidate k, how many classes violate, how many
  * rows would need suppression, and the class-diversity floor.
  *
  * Scale shape: ONE combiner-collapsed groupBy over the corpus produces
  * the QI class table (cardinality = |QI value space|, orders of
  * magnitude under the corpus); every per-k readout is that aggregate ×
  * a broadcast handful of k values. No window, no second corpus pass —
  * the same aggregate-then-broadcast physics as the data-contract
  * report. Suppression fractions are exact integer ppm (micro units
  * would overflow nothing here, but ppm matches the Contracts
  * convention).
  */
object Privacy {

  /** Per-k audit rows: (k, n_classes, n_violating, rows_at_risk,
    * n_lowdiv_classes, suppressed_ppm), ordered by k.
    *
    * @param rows         input corpus
    * @param qiCols       quasi-identifier columns (already generalized —
    *                     bucket numeric QIs BEFORE calling; the audit
    *                     never re-bins)
    * @param sensitiveCol the attribute l-diversity protects
    * @param ks           candidate k thresholds (small constant list)
    */
  def kAnonymityReport(
      rows: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      ks: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(ks.nonEmpty, "need at least one k threshold")
    val spark = rows.sparkSession
    import spark.implicits._
    val classes = rows
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitiveCol)).as("ndiv"))
      .localCheckpoint() // class table: reused by every k readout + total
    val totalRow = classes.agg(sum(col("sz"))).head()
    require(!totalRow.isNullAt(0) && totalRow.getLong(0) > 0, "empty input")
    val total = totalRow.getLong(0)
    classes.crossJoin(broadcast(ks.toDF("k")))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("sz") < col("k"), 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(0L)).as("rows_at_risk"),
        sum(when(col("ndiv") === 1, 1L).otherwise(0L)).as("n_lowdiv_classes"))
      .select(col("k"), col("n_classes"), col("n_violating"), col("rows_at_risk"),
        col("n_lowdiv_classes"),
        expr(s"(rows_at_risk * 1000000L) div ${total}L").as("suppressed_ppm"))
      .orderBy("k")
  }
}
