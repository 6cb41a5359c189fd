package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last hop between a curated corpus and a trainer:
  * lay the corpus out as one deterministic token stream and cut it into
  * fixed-length context windows ("concat-and-split" packing, the standard
  * GPT-style pretraining layout; document boundaries survive as offsets so
  * the trainer can mask cross-document attention).
  *
  * Order is a stable pseudo-random shuffle (md5-derived hash of the id,
  * ties to the id) — reproducible on any cluster/partitioning and
  * replayable in a SQL oracle, like [[Mixture.exportShards]].
  *
  * Scale shape: the only global state is each document's starting offset —
  * an exclusive prefix sum over the shuffle order. A naive window over the
  * whole corpus would be ONE task sorting 100 TB; this implementation
  * computes the prefix sum distributedly over VALUE-DERIVED contiguous
  * buckets (bucket = ord·B div 2^32 — monotonic in the order key, so each
  * bucket is a contiguous slice of the stream; no sampled range boundaries
  * to pin, so the result is partitioning-invariant by construction):
  *
  *   1. per-bucket token subtotals — one combiner-collapsed aggregate,
  *      B rows;
  *   2. cumulative bucket offsets computed on the DRIVER from those B rows
  *      (bounded by the bucket count, not data — same adjudication as
  *      centroid/meta collects) and broadcast back;
  *   3. a per-row running sum WITHIN each bucket — the window's exchange
  *      is the ONLY corpus-sized shuffle in the plan, and every window
  *      task holds ~|corpus|/B rows (hash ords are uniform).
  *
  * offset = bucket offset + in-bucket exclusive sum equals the naive
  * single-window definition bit-for-bit. Size `buckets` for the trainer's
  * corpus: tokens/buckets should fit one task comfortably (the 65536
  * default puts ~1.5 GB of token-count rows per task at 100 TB; raise it
  * for bigger corpora — driver offset state is just B longs).
  */
object Pack {

  /** Assign every document its position in the packed token stream.
    *
    * Input columns: (id, tokens); anything else is dropped. Output:
    * (id, tokens, offset, seq, pos_in_seq, seq_last) where `offset` is the
    * document's first token's global stream position, `seq` = offset DIV
    * seqLen is the context window holding that first token, `pos_in_seq` =
    * offset MOD seqLen, and `seq_last` is the window holding the LAST
    * token (seq_last > seq ⇔ the document spans a window boundary; empty
    * documents get seq_last = seq).
    *
    * @param shuffled true = stable pseudo-random stream order (training
    *                 layout); false = id STRING order (the generic-id,
    *                 oracle-replayable corpus order for debugging/eval
    *                 dumps; note "10" < "2" for numeric ids, and the
    *                 constant order key degenerates to ONE bucket — small
    *                 dumps only).
    */
  def packOffsets(
      docs: DataFrame,
      seqLen: Long,
      shuffled: Boolean = true,
      buckets: Int = 65536): DataFrame = {
    require(seqLen >= 1, s"need seqLen >= 1 (got $seqLen)")
    require(buckets >= 1 && buckets <= (1 << 20),
      s"buckets=$buckets outside [1, 2^20] (driver holds B offsets)")
    val spark = docs.sparkSession
    val ord =
      if (shuffled) graft.functions.TextFunctions.stableHash32b(col("id").cast("string"))
      else lit(0L)
    // narrow base materialized once: the subtotal aggregate and the window
    // both read it, and the upstream (possibly an expensive curated frame)
    // must not execute twice
    val base = docs
      .select(col("id"), col("tokens").cast("long").as("tokens"))
      .withColumn("__ord", ord)
      .withColumn("__id", col("id").cast("string"))
      .withColumn("__bucket",
        expr(s"CAST(__ord * ${buckets}L DIV 4294967296L AS INT)"))
      .localCheckpoint()
    // B rows — bounded by the bucket count, never the data
    val subtotals = base.groupBy("__bucket")
      .agg(sum(col("tokens")).as("psum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsetRows = subtotals.map { case (b, s) =>
      val off = acc; acc += s; (b, off)
    }
    import spark.implicits._
    val offsets = offsetRows.toSeq.toDF("__bucket", "__off")
    val withinBucket = Window.partitionBy("__bucket")
      .orderBy(col("__ord"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("offset",
        col("__off") + coalesce(sum(col("tokens")).over(withinBucket), lit(0L)))
      .withColumn("seq", expr(s"CAST(offset DIV ${seqLen}L AS BIGINT)"))
      .withColumn("pos_in_seq", pmod(col("offset"), lit(seqLen)))
      .withColumn("seq_last",
        expr(s"CAST(greatest(offset, offset + tokens - 1) DIV ${seqLen}L AS BIGINT)"))
      .select("id", "tokens", "offset", "seq", "pos_in_seq", "seq_last")
  }

  /** Per-sequence manifest from [[packOffsets]] output: one row per
    * (seq, id) with the slice of the document the window carries —
    * `doc_begin`/`doc_end` token positions within the document (end
    * exclusive). A trainer (or an export writer) joins this against
    * tokenized documents to emit window contents; the explode is bounded
    * by each document's own span count (≤ tokens/seqLen + 1), so the
    * operator stays linear in output size.
    */
  def sequenceManifest(packed: DataFrame, seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"need seqLen >= 1 (got $seqLen)")
    packed
      .filter(col("tokens") > 0)
      .withColumn("seq", explode(sequence(col("seq"), col("seq_last"))))
      .withColumn("seq_start", col("seq") * seqLen)
      // document token range [doc_begin, doc_end) landing in this window
      .withColumn("doc_begin",
        greatest(lit(0L), col("seq_start") - col("offset")))
      .withColumn("doc_end",
        least(col("tokens"), col("seq_start") + seqLen - col("offset")))
      .select("seq", "id", "doc_begin", "doc_end", "offset", "tokens")
  }
}
