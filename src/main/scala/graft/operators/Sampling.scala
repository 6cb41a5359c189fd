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

  /** WEIGHTED fixed-size sample without replacement — Efraimidis–Spirakis
    * (2006) exponential keys in their Gumbel form: top-k by
    * `ln(w) + Gumbel` draws each size-k subset with the same probability
    * as sequential weighted draws without replacement. The randomness is
    * hash-derived (u from the id's md5 hash, g = −ln(−ln u) — the
    * [[Dsir.resampleTopK]] construction), so the sample is deterministic,
    * partitioning-invariant, and SQL-replayable; keys are summed in
    * micro-units so the order is integer-exact. The training-mixture use:
    * sample documents proportional to token count (or quality score)
    * instead of uniformly, without a corpus sort — compiles to
    * `TakeOrderedAndProject` (per-partition bounded heap).
    *
    * `weightCol` must be a positive integer column; rows with weight ≤ 0
    * or null are excluded (they have zero selection probability).
    */
  def weightedFixedSize(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1 (got $k)")
    df.filter(col(weightCol) > 0)
      .withColumn("__key", weightedKeyMicro(col(idCol), col(weightCol)))
      .orderBy(col("__key").desc, col(idCol).cast("string"))
      .limit(k)
      .drop("__key")
  }

  /** Weighted fixed-size sample PER GROUP (per-language / per-source
    * carve): one keyed window, WindowGroupLimit bounds per-task work.
    */
  def weightedFixedSizePerGroup(
      df: DataFrame, idCol: String, weightCol: String, groupCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1 (got $k)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(weightedKeyMicro(col(idCol), col(weightCol)).desc,
        col(idCol).cast("string"))
    df.filter(col(weightCol) > 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** `⌊10^6·ln w⌋ + ⌊10^6·g⌋` with hash-Gumbel g — deterministic micro-key
    * shared by both weighted samplers (and replayed by the oracle).
    */
  private def weightedKeyMicro(idCol: Column, weightCol: Column): Column = {
    val u = (TextFunctions.stableHash32(idCol.cast("string")).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    floor(log(weightCol.cast("double")) * lit(1e6)).cast("long") +
      floor(-log(-log(u)) * lit(1e6)).cast("long")
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
