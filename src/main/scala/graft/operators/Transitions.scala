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
