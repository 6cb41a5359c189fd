package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed n-gram
  * profile looks like a trusted target corpus. Feature = hashed unigrams +
  * bigrams into B buckets; each corpus yields a smoothed bucket
  * distribution; a document's importance weight is the log-likelihood
  * ratio of its features under target vs raw; selection is Gumbel top-k
  * over the weights (importance resampling without replacement).
  *
  * Determinism: the paper's random Gumbel noise is replaced by
  * hash-derived Gumbel (u from the md5-based id hash, g = −ln(−ln u)) —
  * same distribution, reproducible on any partitioning and replayable in
  * a SQL oracle. Per-document weights are summed in MICRO-NATS (each
  * bucket's log ratio floored to 1e-6 nats first, as in
  * [[graft.dedup.Perplexity]]), so aggregation is exact integer
  * arithmetic under Spark's nondeterministic reduce order.
  *
  * Scale shape: the two distributions are keyed (bucket) aggregations with
  * map-side combine, each B rows; the ratio table is a broadcast; per-doc
  * weights are one combiner-collapsed aggregation of (id, bucket)
  * multiplicities; top-k compiles to TakeOrderedAndProject (per-partition
  * bounded heap). For corpus-sized k, swap the heap for the binned
  * threshold form ([[Mixture.tokenBudgetFill]] with tokens = 1 and
  * quality = the coarsely-binned key) — same contract as the mixture
  * operators.
  */
object Dsir {

  /** Hashed feature buckets of a token array: unigrams + adjacent bigrams
    * (joined with a space), each md5-hashed into [0, buckets).
    */
  def featureBuckets(toks: Column, buckets: Int): Column = {
    val unis = transform(toks, t =>
      pmod(graft.functions.TextFunctions.stableHash32(t), lit(buckets.toLong)))
    val bis = when(size(toks) < 2, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(0), size(toks) - lit(2)), i =>
        pmod(graft.functions.TextFunctions.stableHash32(
          concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2))),
          lit(buckets.toLong))))
    concat(unis, bis)
  }

  /** Corpus-level bucket counts: (bucket, c) over (id, toks) rows. */
  def bucketCounts(docsToks: DataFrame, buckets: Int): DataFrame =
    docsToks
      .select(explode(featureBuckets(col("toks"), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))

  /** Per-bucket importance table: r_micro = floor(1e6 · (ln p̂_target −
    * ln p̂_raw)) with add-one smoothing over the full bucket space
    * (p̂ = (c+1)/(N+B)), covering buckets unseen in either corpus. B rows,
    * built with one spark.range — broadcastable by construction.
    */
  def importanceTable(
      targetCounts: DataFrame,
      rawCounts: DataFrame,
      buckets: Int): DataFrame = {
    val spark = targetCounts.sparkSession
    val nt = targetCounts.agg(coalesce(sum("c"), lit(0L)).as("nt"))
    val nr = rawCounts.agg(coalesce(sum("c"), lit(0L)).as("nr"))
    spark.range(buckets).select(col("id").as("bucket"))
      .join(targetCounts.withColumnRenamed("c", "ct"), Seq("bucket"), "left")
      .join(rawCounts.withColumnRenamed("c", "cr"), Seq("bucket"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("bucket"),
        floor((log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
                   (col("nt") + lit(buckets.toLong)).cast("double")) -
               log((coalesce(col("cr"), lit(0L)) + lit(1)).cast("double") /
                   (col("nr") + lit(buckets.toLong)).cast("double"))) * lit(1e6))
          .cast("long").as("r_micro"))
  }

  /** Per-document importance weights: (id, n_feats, w_micro, avg_w) —
    * w_micro = Σ_feature multiplicity · r_micro(bucket), avg_w the
    * per-feature mean in nats (length-normalized view; the paper's raw
    * sum is w_micro). `buckets` must match the B the table was built with.
    */
  def importanceWeights(
      docsToks: DataFrame,
      table: DataFrame,
      buckets: Int): DataFrame =
    docsToks
      .select(col("id"), explode(featureBuckets(col("toks"), buckets)).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("occ"))
      .join(broadcast(table), Seq("bucket"))
      .groupBy("id")
      .agg(sum("occ").as("n_feats"),
        sum(col("occ") * col("r_micro")).as("w_micro"))
      .select(col("id"), col("n_feats"), col("w_micro"),
        (col("w_micro").cast("double") /
          (col("n_feats").cast("double") * 1e6)).as("avg_w"))

  /** Gumbel top-k selection over [[importanceWeights]] output: key =
    * w_micro + g_micro with hash-derived Gumbel noise g = −ln(−ln u),
    * u = (h+0.5)/2^32 from the id's md5 hash — deterministic importance
    * resampling without replacement. Ties (impossible-in-practice equal
    * keys) break to the lower id string.
    */
  def resampleTopK(weights: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1 (got $k)")
    val u = (graft.functions.TextFunctions.stableHash32(col("id").cast("string"))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    weights
      .withColumn("g_micro", floor(-log(-log(u)) * lit(1e6)).cast("long"))
      .withColumn("key_micro", col("w_micro") + col("g_micro"))
      .orderBy(col("key_micro").desc, col("id").cast("string"))
      .limit(k)
  }
}
