package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Small-file compaction planning — the table-maintenance primitive every
  * long-lived 100 TB corpus needs: given the file inventory (file id,
  * bytes), slice the id-ordered file stream into contiguous merge groups
  * of ~`target` bytes each ("greedy bin packing by running total":
  * group = exclusive-prefix-sum(bytes) DIV target).
  *
  * Contiguity in file order is deliberate: merging ADJACENT files
  * preserves any order-correlated layout (time-partitioned landing zones,
  * z-ordered table regions) instead of shuffling cold data into hot
  * groups.
  *
  * Scale shape mirrors [[Pack.packOffsets]]'s distributed prefix sum: the
  * inventory is FILE-count-sized (metadata, ~millions of rows at 100 TB,
  * never the corpus), but even that never sorts in one task —
  *   1. per-coarse-bucket byte subtotals (bucket = file_id DIV span, so
  *      buckets are contiguous id ranges, monotone in the stream order);
  *   2. bucket base offsets cumulated on the driver (B longs) and joined
  *      back as a broadcast;
  *   3. an in-bucket running sum — the only window, partitioned by bucket.
  */
object Compaction {

  /** Plan merge groups over `files` (file_id: long, bytes: long).
    *
    * @param target desired group size in bytes
    * @param span   file_ids per coarse prefix-sum bucket
    * @return one row per merge group: (merge_group, n_files, total_bytes,
    *         first_file, last_file)
    */
  def plan(files: DataFrame, target: Long, span: Long = 1 << 16): DataFrame = {
    require(target >= 1, s"need target >= 1 (got $target)")
    require(span >= 1, s"need span >= 1 (got $span)")
    val spark = files.sparkSession
    import spark.implicits._

    val base = files
      .select(col("file_id").cast("long").as("file_id"),
        col("bytes").cast("long").as("bytes"))
      .withColumn("bucket", expr(s"file_id DIV ${span}L"))
      .localCheckpoint()

    // B rows — bounded by the id range / span, never the inventory size
    val subtotals = base.groupBy("bucket").agg(sum("bytes").as("bsum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = subtotals.map { case (b, s) => val off = acc; acc += s; (b, off) }
    val baseDf = broadcast(bases.toSeq.toDF("bucket", "bucket_base"))

    val inBucket = Window.partitionBy("bucket").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(baseDf, "bucket")
      .withColumn("before",
        col("bucket_base") + coalesce(sum("bytes").over(inBucket), lit(0L)))
      .withColumn("merge_group", expr(s"before DIV ${target}L"))
      .groupBy("merge_group")
      .agg(count(lit(1)).as("n_files"),
        sum("bytes").as("total_bytes"),
        min("file_id").as("first_file"),
        max("file_id").as("last_file"))
  }
}
