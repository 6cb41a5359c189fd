package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-scoped event-transition matrix (first-order Markov chain).
  *
  * Within each gap-delimited session, adjacent event-type pairs are
  * counted and each transition row is expressed as an exact
  * micro-probability (`n * 1e6 div row_total` — integer division, no
  * float). The telemetry answer to "what do users do next", and the
  * input to Markov-chain session simulation.
  *
  * Scale shape: two windows, both PARTITIONED by user (then by
  * user+session) — per-key event density bounds window width, so no
  * unpartitioned sort anywhere — followed by two keyed aggregates whose
  * output is |event-type|^2-bounded. Map-side combine collapses the
  * transition counts before the tiny final shuffle.
  */
object Transitions {

  /** Top-k n-step session paths — the flow report behind every "how do
    * users reach purchase" question, and the n-gram generalization of
    * [[sessionTransitions]]'s bigrams: consecutive `steps`-long
    * event-type sequences inside gap-delimited sessions, counted and
    * ranked. Same windows-partitioned-by-user shape (per-key density
    * bounds window width), one keyed count whose key space is bounded by
    * |event-type|^steps, top-k via TakeOrderedAndProject.
    */
  def sessionPaths(
      events: DataFrame,
      gapMs: Long = 30L * 60 * 1000,
      steps: Int = 3,
      k: Int = 20): DataFrame = {
    require(steps >= 2 && steps <= 5, s"steps=$steps outside [2,5]")
    require(k >= 1, s"need k >= 1 (got $k)")
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val ev = events
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val bySess = Window.partitionBy("user_id", "session_idx")
      .orderBy(col("ts_ms"), col("event_id"))
    val withLeads = (1 until steps).foldLeft(ev.withColumn("e0", col("event_type"))) {
      case (df, i) => df.withColumn(s"e$i", lead(col("event_type"), i).over(bySess))
    }
    withLeads
      .filter((1 until steps).map(i => col(s"e$i").isNotNull).reduce(_ && _))
      .select(concat_ws(" > ", (0 until steps).map(i => col(s"e$i")): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** events: (user_id, event_id, event_type, ts_ms). Same gap rule as the
    * sessionize operators so session boundaries agree across reports.
    */
  def sessionTransitions(events: DataFrame, gapMs: Long = 30L * 60 * 1000): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val ev = events
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val bySess = Window.partitionBy("user_id", "session_idx")
      .orderBy(col("ts_ms"), col("event_id"))
    val trans = ev
      .withColumn("dst", lead(col("event_type"), 1).over(bySess))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val tot = trans.groupBy("src").agg(sum("n").as("row_total"))
    trans.join(tot, "src")
      .select(col("src"), col("dst"), col("n"),
        expr("(n * 1000000L) div row_total").as("p_micro"))
  }
}
