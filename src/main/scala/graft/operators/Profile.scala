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
}
