package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-replayable HyperLogLog (Flajolet–Fuchs–Gandouet–Meunier 2007)
  * — mergeable distinct-count sketching, THE cardinality primitive for
  * 100 TB profiling (exact count-distinct shuffles every value; the
  * sketch shuffles at most m register rows per group).
  *
  * Everything is deterministic given the value bytes, so a SQL oracle
  * replays the REGISTERS THEMSELVES, not just "an estimate close to
  * ours": the 60-bit hash is the first 15 hex chars of md5 (both engines
  * agree on md5), the leading-zero rank comes from `length(bin(z))` —
  * exact integer arithmetic, no float log2 — and the harmonic-mean
  * denominator is accumulated as an exact INTEGER (every 2^-reg term
  * scaled by 2^(W+1)), so even the final double estimate is one division
  * of identical operands on both sides. approx_count_distinct gives a
  * faster native HLL++ when nobody needs to audit it; this one is for
  * when the number must be reproducible.
  *
  * Scale shape: one narrow map (hash/bucket/rank) + one combiner-
  * collapsed (group, register) max aggregate; estimates reduce the ≤ m
  * register rows per group. Merging two corpora's sketches is the same
  * max aggregate over the union — proven row-identical in HllSpec.
  */
object Hll {

  /** Precision: m = 2^p registers, W = 60 - p payload bits. */
  val DefaultP = 9

  private def checkP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"p must be in 4..16, got $p")

  /** Sparse register table: (groupCols..., reg_idx, reg) — one row per
    * NON-EMPTY register, reg = max leading-zero rank seen in the bucket.
    * Union-max mergeable: `registers(a ∪ b) == merge(registers(a),
    * registers(b))` exactly.
    */
  def registers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = DefaultP): DataFrame = {
    checkP(p)
    val w = 60 - p
    val h = expr(s"cast(conv(substring(md5(cast($valueCol as string)), 1, 15), 16, 10) as bigint)")
    val idx = shiftright(h, w)
    val z = h.bitwiseAND(lit((1L << w) - 1))
    val rho = when(z === 0, lit(w + 1))
      .otherwise(lit(w + 1) - length(bin(z)))
    df.select((groupCols.map(col) :+ idx.as("reg_idx") :+ rho.as("rho")): _*)
      .groupBy((groupCols :+ "reg_idx").map(col): _*)
      .agg(max(col("rho")).cast("int").as("reg"))
  }

  /** Merge two sparse register tables (same groupCols/p): union + max. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "reg_idx").map(col): _*)
      .agg(max(col("reg")).cast("int").as("reg"))

  /** Per-group estimates from a sparse register table:
    * (groupCols..., n_set, s_int, est) where `s_int` is the EXACT
    * integer harmonic-denominator Σ 2^(W+1-reg) over set registers
    * (empty registers contribute 2^(W+1) each, added in closed form),
    * and `est` applies the standard bias-corrected formula with the
    * small-range linear-counting fallback. With p ≤ 16 and W ≥ 44,
    * s_int ≤ m·2^(W+1) < 2^62 — no overflow.
    */
  def estimate(regs: DataFrame, groupCols: Seq[String], p: Int = DefaultP): DataFrame = {
    checkP(p)
    val w = 60 - p
    val m = 1L << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_set"),
        sum(expr(s"shiftleft(cast(1 as bigint), ${w + 1} - reg)"))
          .as("s_set"))
      .withColumn("s_int",
        col("s_set") + (lit(m) - col("n_set")) * lit(1L << (w + 1)))
      .withColumn("raw",
        lit(alpha * m * m * math.pow(2.0, w + 1)) / col("s_int"))
      .withColumn("est",
        when(col("raw") <= lit(2.5 * m) && col("n_set") < lit(m),
          lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("n_set"))))
          .otherwise(col("raw")))
      .select((groupCols.map(col) :+ col("n_set") :+ col("s_int") :+
        round(col("est"), 3).as("est")): _*)
  }
}
