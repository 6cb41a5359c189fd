package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence-pattern matching over keyed event streams — the lightweight
  * MATCH_RECOGNIZE: encode each key's time-ordered event types as a
  * one-char-per-event code string, then count regex matches of a pattern
  * ("view, then anything but purchase, then purchase" = `v[^p]*p`).
  * Both engines count non-overlapping left-to-right matches, so the
  * result replays exactly in the oracle.
  *
  * Scale shape: ONE keyed aggregate (collect per key, sort in-row, join
  * to a string) + a per-row regex — no self-joins, no windows. The
  * per-key sequence must fit a row (the standard sequence-mining bound);
  * keys hotter than that get capped upstream (sessionize first and match
  * per session, or WindowGroupLimit the tail).
  */
object Sequences {

  /** Per-key code string in (ord, tieBreak) order. */
  def encode(events: DataFrame, key: String, ord: String, tie: String,
      code: Column): DataFrame =
    events
      .select(col(key).as("key"), struct(col(ord), col(tie), code.as("code")).as("ev"))
      .groupBy("key")
      .agg(array_join(
        transform(sort_array(collect_list(col("ev"))), e => e.getField("code")),
        "").as("seq"))

  /** Count non-overlapping `pattern` matches per key. */
  def patternCounts(encoded: DataFrame, pattern: String): DataFrame =
    encoded.withColumn("matches",
      regexp_count(col("seq"), lit(pattern)).cast("long"))
}
