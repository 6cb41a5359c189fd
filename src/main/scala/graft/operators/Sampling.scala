package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic corpus sampling — the downsampling stage of a training-data
  * pipeline. Unlike `DataFrame.sample` (seeded per-partition RNG, so results
  * change with partitioning/layout), the gate here is a pure function of the
  * row's id: stableHash32(id) spread over 10^4 buckets. The same row is
  * kept or dropped on any cluster, any partition count, any run — which is
  * what reproducible corpus construction at 100 TB requires — and the
  * operator is a scan-local filter: no shuffle, fully codegen'd, pushdown
  * beneath it unaffected.
  */
object Sampling {

  private val Buckets = 10000L

  /** Keep-gate for `fraction` (resolution 1/10000) of rows by hashed id. */
  def gate(idCol: Column, fraction: Double): Column = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    TextFunctions.stableHash32(idCol.cast("string")) % Buckets <
      lit(math.round(fraction * Buckets))
  }

  /** Uniform deterministic sample. */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(gate(col(idCol), fraction))

  /** Fixed-SIZE deterministic sample: exactly min(k, |df|) rows — the k
    * lowest hash-of-id values (ties to the id string). Fraction gates
    * can't carve an eval set of exactly 10k documents; this compiles to
    * `TakeOrderedAndProject` (per-partition bounded heap, no corpus
    * sort), and the chosen set is partitioning-invariant and STABLE under
    * corpus growth in the hash-prefix sense: a row leaves the sample only
    * when a new row hashes below the current k-th value.
    */
  def fixedSize(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1 (got $k)")
    df.withColumn("__h", TextFunctions.stableHash32(col(idCol).cast("string")))
      .orderBy(col("__h"), col(idCol).cast("string"))
      .limit(k)
      .drop("__h")
  }

  /** Fixed size PER GROUP: the k lowest-hash rows of each group — the
    * per-language eval-carve. One keyed window (linear, one shuffle);
    * per-task work is bounded because `row_number ≤ k` applies
    * group-locally (WindowGroupLimit pushes the limit into the sort at
    * Spark 4).
    */
  def fixedSizePerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1 (got $k)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(TextFunctions.stableHash32(col(idCol).cast("string")),
        col(idCol).cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Stratified deterministic sample: per-stratum fractions with a default
    * for unlisted strata. One scan, no shuffle; the rate lookup is a
    * literal CASE chain (broadcast-free).
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(TextFunctions.stableHash32(col(idCol).cast("string")) % Buckets <
      round(rate * Buckets).cast("long"))
  }
}
