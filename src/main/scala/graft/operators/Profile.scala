package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling — the "ANALYZE TABLE" a data pipeline runs before and
  * after every transform batch: per-column row/null/distinct counts and
  * min/max, in ONE aggregation pass over the table (long-form output, one
  * row per column).
  *
  * Scale shape: a single global aggregate — partial aggregation collapses
  * every partition to one row of counters before the 1-row exchange.
  * Exact distinct counts make the multi-column agg an Expand (one
  * duplicated pass per distinct column) — the oracle-checkable form;
  * `approxDistinct = true` swaps HyperLogLog sketches in (no Expand, one
  * true pass) for 100 TB profiling where ±2% distinct error is fine.
  * min/max are cast to string after computing on the native type, so
  * ordering is the column's own, not lexicographic.
  */
object Profile {

  def profile(
      df: DataFrame,
      cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    def nd(c: String) =
      if (approxDistinct) approx_count_distinct(col(c))
      else count_distinct(col(c))
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      nd(c).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))) :+ count(lit(1)).as("__rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }

  /** Grouped quantiles with an exact/approx switch — the distribution
    * fingerprint (p50/p90/p99 token lengths etc.) every curation batch
    * reports. Exact `percentile` is a per-group sort — the oracle-checkable
    * form, fine to ~10^8 rows/group; `approx = true` swaps in
    * `approx_percentile` (Greenwald-Khanna sketch, mergeable partials, no
    * sort) whose rank error is bounded by 1/`accuracy` — the 100 TB form.
    * Output long-form: (group, p, value).
    */
  def percentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must lie in [0,1]: $ps")
    val arr = array(ps.map(lit): _*)
    val agg =
      if (approx) approx_percentile(col(valueCol).cast("double"), arr, lit(accuracy))
      else percentile(col(valueCol).cast("double"), arr)
    df.groupBy(groupCol)
      .agg(agg.as("__q"))
      .select(col(groupCol).as("group"),
        explode(arrays_zip(array(ps.map(lit): _*).as("p"), col("__q").as("value"))).as("z"))
      .select(col("group"), col("z.p").as("p"), col("z.value").cast("double").as("value"))
  }

  /** Per-group equi-width histogram of a LONG value column — the other
    * half of ANALYZE next to [[percentiles]]: (group, bin, lo, hi, n)
    * with `nBins` integer-exact bins spanning the group's [min, max]
    * (the max lands in the last bin). Two keyed aggregations: per-group
    * min/max (broadcast back), then the bin counts — both map-side
    * combinable, nothing corpus-sized crosses the driver. Bin edges are
    * integer arithmetic (`lo + i·width`, width = ceil(span/nBins)), so
    * the oracle replays them exactly — no float bucket boundaries to
    * drift between engines.
    */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1 && nBins <= 100000, s"nBins $nBins out of range")
    val bounds = df.groupBy(col(groupCol).as("group"))
      .agg(min(col(valueCol)).cast("long").as("__lo"),
        max(col(valueCol)).cast("long").as("__hi"))
    val width = greatest(
      ceil((col("__hi") - col("__lo") + 1).cast("double") / nBins).cast("long"),
      lit(1L))
    df.select(col(groupCol).as("group"), col(valueCol).cast("long").as("__v"))
      .join(broadcast(bounds), "group")
      .withColumn("__w", width)
      .withColumn("bin",
        least(expr("(__v - __lo) div __w"), lit(nBins - 1L)))
      .groupBy("group", "bin", "__lo", "__w")
      .agg(count(lit(1)).as("n"))
      .select(col("group"), col("bin"),
        (col("__lo") + col("bin") * col("__w")).as("lo"),
        (col("__lo") + (col("bin") + 1) * col("__w") - 1).as("hi"),
        col("n"))
  }

  /** Per-dimension embedding statistics — the embedding-quality QA report
    * (dead dimensions, range drift, variance collapse) run before trusting
    * an embedding column for similarity work. Values are micro-quantized
    * to integers so every count/min/max/sum is exact; mean and biased
    * variance use explicit floor division (NOT `div`/DuckDB `//` — sums
    * can be negative, and Spark `div` truncates toward zero while DuckDB
    * `//` floors, so only a shared floor form replays portably). One
    * posexplode + one |dims|-keyed combine-friendly aggregate: at 100 TB
    * this is a single map pass and a 64-key shuffle.
    */
  def embeddingStats(vecs: DataFrame): DataFrame =
    vecs
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * lit(1e6), 0).cast("long").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), min("q").as("min_micro"),
        max("q").as("max_micro"), sum("q").as("sum_q"),
        sum(col("q") * col("q")).as("sum_q2"))
      .withColumn("mean_micro",
        floor(col("sum_q").cast("double") / col("n")).cast("long"))
      .select(col("dim"), col("n"), col("min_micro"), col("max_micro"),
        col("mean_micro"),
        (floor(col("sum_q2").cast("double") / col("n")).cast("long")
          - col("mean_micro") * col("mean_micro")).as("var_micro2"))

  /** MERGEABLE profile over long-typed metric columns — the incremental
    * form of [[profile]]: every statistic here (counts, min, max, sum) is
    * an exact semigroup, so the profile of `corpus ∪ batch` is
    * [[mergeProfiles]] of the two parts' profiles — stats maintenance
    * after an ingest batch costs O(batch), never a corpus re-scan. (Exact
    * distinct counts are deliberately absent: they don't merge; the HLL
    * sketch in `profile(approxDistinct = true)` is the mergeable
    * substitute.) Long-form output: one row per column, all-BIGINT.
    */
  def profileLong(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      min(col(c).cast("long")).as(s"__min_$c"),
      max(col(c).cast("long")).as(s"__max_$c"),
      sum(col(c).cast("long")).as(s"__sum_$c"))) :+ count(lit(1)).as("__rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        coalesce(col(s"__sum_$c"), lit(0L)).as("sum_value"))): _*)).as("p"))
      .select("p.*")
  }

  /** Merge two [[profileLong]] outputs: counts and sums add, min/max
    * fold. A |cols|-row aggregate — the whole merge is metadata-sized.
    */
  def mergeProfiles(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("column")
      .agg(sum("n_rows").as("n_rows"), sum("n_nulls").as("n_nulls"),
        min("min_value").as("min_value"), max("max_value").as("max_value"),
        sum("sum_value").as("sum_value"))
}
