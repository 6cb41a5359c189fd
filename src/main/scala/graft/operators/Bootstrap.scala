package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Poisson bootstrap — distributed confidence intervals from ONE corpus
  * pass (Chamandy et al. 2012, "Estimating uncertainty for massive data
  * streams": classical bootstrap resampling is impossible at corpus scale
  * because each of the B resamples would be a full shuffle of the data;
  * the Poisson approximation gives every (row, replica) pair an
  * independent Poisson(1) resample weight, so all B resample statistics
  * accumulate in a single keyed aggregate).
  *
  * Determinism: weights are drawn by inverse-CDF over a uniform 32-bit
  * md5 hash of (id, replica) — the same draw on any cluster layout, and
  * exactly replayable in the oracle. Scale shape: a B-way explode of
  * narrow (id, value) rows that map-side-combines to B rows per
  * partition before the exchange; driver state is the B replica means
  * (B is a small constant, default 32).
  */
object Bootstrap {

  /** floor(CDF_Poisson(1)(k) * 2^32) for k = 0..5 — a uniform 32-bit
    * hash u maps to weight |{k : u >= T(k)}| (≥ 6 truncated to 6; mass
    * beyond 5 is 6e-4). Shared literals: the oracle embeds these same
    * integers.
    */
  val CdfThresholds: Seq[Long] =
    Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L, 4292415291L)

  /** Poisson(1) weight of (id, replica) — a codegen'd sum of 6 threshold
    * indicators over one md5 hash.
    */
  def weight(id: Column, rep: Column): Column = {
    val u = TextFunctions.stableHash32(concat_ws(":", id, rep))
    CdfThresholds.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(u >= lit(t), 1L).otherwise(0L)
    }
  }

  /** The B resample means of `valueCol` (long), in micro units (exact
    * integer division). One corpus pass: explode to B replicas, keyed
    * aggregate on replica id.
    */
  def replicaMeans(rows: DataFrame, idCol: String, valueCol: String, b: Int): DataFrame =
    rows
      .select(col(idCol).as("id"), col(valueCol).cast("long").as("v"),
        explode(array((0 until b).map(i => lit(i.toLong)): _*)).as("rep"))
      .withColumn("w", weight(col("id"), col("rep")))
      .groupBy("rep")
      .agg(sum(col("w") * col("v")).as("swv"), sum(col("w")).as("sw"))
      .select(col("rep"),
        expr("(swv * 1000000L) div sw").as("mean_micro"))

  /** Percentile-bootstrap CI of the mean: point estimate (full-sample
    * mean, micro) plus the replica-mean order statistics after dropping
    * `round(alpha*B)` replicas from each end (alpha=0.025, B=32 → drop
    * 1: lo = 2nd smallest, hi = 2nd largest). The order statistics sort
    * B driver-side longs — bounded by the replica constant, never by the
    * corpus.
    */
  def meanCi(rows: DataFrame, idCol: String, valueCol: String,
      b: Int = 32, alpha: Double = 0.025): DataFrame = {
    val spark = rows.sparkSession
    val point = rows.agg(
        sum(col(valueCol).cast("long")).as("sv"), count(lit(1)).as("n"))
      .select(expr("(sv * 1000000L) div n").as("p"), col("n")).head()
    require(!point.isNullAt(0) && point.getLong(1) > 0,
      s"meanCi needs at least one non-null '$valueCol' row; got an empty input")
    // a replica whose Poisson weights all drew 0 (possible only for tiny
    // n; P ≈ (1/e)^n) has no resample mean — fall back to the point
    // estimate rather than NPE inside getLong
    val means = replicaMeans(rows, idCol, valueCol, b)
      .collect().map(r => if (r.isNullAt(1)) point.getLong(0) else r.getLong(1))
      .sorted
    val drop = math.round(alpha * b).toInt
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_rows", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("point_micro", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lo_micro", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("hi_micro", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(b.toLong, point.getLong(1), point.getLong(0),
        means(drop), means(b - 1 - drop))),
      schema)
  }
}
