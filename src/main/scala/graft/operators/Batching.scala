package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed inference batching: order documents by token length
  * (descending, id ties) and cut fixed-size batches, so each batch pads
  * every member to ITS max — the standard padding-waste minimizer for
  * batched transformer inference/scoring (the serving-side sibling of
  * [[Pack]]'s training layout). Sorting by length makes batch members
  * near-equal length; waste = Σ(batch_max − len) collapses versus
  * arrival-order batching.
  *
  * Scale shape: the global (len DESC, id) rank is computed WITHOUT a
  * global sort — the per-length counts aggregate to a histogram (bounded
  * by the max document length, not the corpus), cumulative offsets for
  * each length value fold on the driver from those few rows, and the
  * in-length rank is a keyed window partitioned by the length value.
  * rank = length offset + in-length rank reproduces the single-window
  * definition exactly; the only corpus-sized exchange is the keyed
  * window's.
  */
object Batching {

  /** Per-document batch assignment: (id, len, rank, batch), rank 0-based
    * in (len DESC, id ASC) order, batch = rank div batchSize.
    */
  def byLength(
      docs: DataFrame,
      idCol: String,
      lenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"need batchSize >= 1, got $batchSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(lenCol).cast("long").as("len"))
    // histogram-sized driver fold: offsets of each length value in the
    // global descending order
    val hist = base.groupBy("len").agg(count(lit(1)).as("n"))
      .orderBy(col("len").desc).collect()
    var acc = 0L
    val offsets = hist.map { r =>
      val o = acc; acc += r.getLong(1); (r.getLong(0), o)
    }.toSeq.toDF("len", "_len_off")
    val w = Window.partitionBy("len").orderBy("id")
    base.join(broadcast(offsets), "len")
      .withColumn("rank", col("_len_off") + row_number().over(w) - 1)
      .withColumn("batch", floor(col("rank") / batchSize))
      .select("id", "len", "rank", "batch")
  }

  /** Batch-level padding report over a [[byLength]] assignment: each
    * batch's size, max length, real token total, and padding waste
    * (what the batch pads to minus what it carries).
    */
  def paddingReport(assigned: DataFrame): DataFrame =
    assigned.groupBy("batch")
      .agg(count(lit(1)).as("n_docs"),
        max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .withColumn("pad_waste", col("n_docs") * col("max_len") - col("sum_len"))
      .orderBy("batch")
}
