package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the ops primitive behind "what changed between
  * yesterday's crawl and today's": classify every id across two snapshots
  * as added / removed / changed / unchanged by content digest.
  *
  * Scale shape: ONE full-outer join on id. Both snapshots live in the
  * engine's id-hash-bucketed layout (README "the documents table itself is
  * id-hash-bucketed"), so the join is bucket-aligned — matching buckets
  * co-locate and no side shuffles the corpus. Content comparison is by
  * md5 digest computed in the scan projection (whole-stage codegen), so
  * the join carries 16-byte digests, never the document bodies. The
  * per-status rollup is a keyed aggregate with map-side partials.
  */
object CorpusDiff {

  /** Row-level diff: (id, status) for every id present in either snapshot.
    * Inputs need (id, content); extra columns are ignored.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("id").as("o_id"), md5(col("content")).as("o_digest"))
    val n = newSnap.select(col("id").as("n_id"), md5(col("content")).as("n_digest"))
    o.join(n, o("o_id") === n("n_id"), "full_outer")
      .select(
        coalesce(col("o_id"), col("n_id")).as("id"),
        when(col("o_id").isNull, lit("added"))
          .when(col("n_id").isNull, lit("removed"))
          .when(col("o_digest") =!= col("n_digest"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Per-status rollup with a deterministic id checksum (sum of ids) so a
    * summary mismatch localizes to membership, not just counts.
    */
  def summary(oldSnap: DataFrame, newSnap: DataFrame): DataFrame =
    diff(oldSnap, newSnap)
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        sum(col("id").cast("long")).as("id_checksum"))
}
