package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixture operators: token-budget fill per group and
  * deterministic export sharding — the two steps between a curated corpus
  * and a training run (choose the mixture, lay out the shards).
  */
object Mixture {

  /** Select documents per group (e.g. language/source) to fill a token
    * budget, preferring higher quality — greedy semantics: a document is
    * kept iff the running token sum over (quality DESC, id ASC) within its
    * group stays within `budget`.
    *
    * Scale shape — the naive form is a window over (group) with only a
    * handful of groups: a giant per-group single-task sort at corpus
    * scale. This implementation is the two-level threshold form instead:
    *
    *   1. aggregate token sums per (group, quality) — combiner-collapsed,
    *      output is |distinct quality| rows per group (quality is a
    *      rounded score: bounded, small);
    *   2. a window over that TINY aggregate finds each group's boundary
    *      quality bin and the budget remaining at the boundary;
    *   3. docs in bins above the boundary pass with no further work; only
    *      the boundary bin's documents sort (per (group, quality) — one
    *      bin, not the group) to fill the remainder by id order.
    *
    * Identical output to the greedy definition, but the only corpus-sized
    * shuffles are one aggregate and one boundary-bin window — nothing
    * sorts a whole group on one task.
    *
    * Input columns: (id, group, quality, tokens); output: the kept rows.
    */
  def tokenBudgetFill(docs: DataFrame, budget: Long): DataFrame = {
    val base = narrowBase(docs)
    fillFromBase(base,
      base.select("group").distinct().withColumn("budget", lit(budget)))
  }

  /** [[tokenBudgetFill]] with a PER-GROUP budget frame (group, budget) —
    * the primitive behind temperature mixtures and any non-uniform split.
    * Groups absent from `budgets` are dropped (no budget = keep nothing).
    */
  def tokenBudgetFillPerGroup(docs: DataFrame, budgets: DataFrame): DataFrame =
    fillFromBase(narrowBase(docs), budgets.select("group", "budget"))

  /** Materialize the NARROW projection once (id/group/quality/tokens):
    * the fill reads it three times (bin aggregate + the two keyed
    * branches), and without this an expensive upstream — a full quality
    * scan of the corpus — would re-run per branch. One eager write of
    * four narrow columns beats repeated corpus scans at any scale.
    */
  private def narrowBase(docs: DataFrame): DataFrame =
    docs.select(col("id"), col("group"), col("quality"), col("tokens"))
      .localCheckpoint()

  private def fillFromBase(base: DataFrame, budgets: DataFrame): DataFrame = {
    val binned = base.groupBy("group", "quality")
      .agg(sum(col("tokens")).as("bin_tokens"))
      .join(broadcast(budgets), Seq("group"))
    val byQuality = Window.partitionBy("group")
      .orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val bins = binned
      .withColumn("cum", sum(col("bin_tokens")).over(byQuality))
      .withColumn("full", col("cum") <= col("budget"))
      // budget left when this bin starts (only meaningful for the first
      // non-full bin = the boundary bin)
      .withColumn("remaining", col("budget") - (col("cum") - col("bin_tokens")))
    val boundary = Window.partitionBy("group")
      .orderBy(col("quality").desc)
    val marked = bins.withColumn("prev_full",
        lag(col("full"), 1, true).over(boundary))
      .withColumn("is_boundary", !col("full") && col("prev_full"))
      .select("group", "quality", "full", "is_boundary", "remaining")
    val joined = base.join(broadcast(marked), Seq("group", "quality"))
    val fullDocs = joined.filter(col("full"))
      .select("group", "id", "quality", "tokens")
    // Boundary-bin fill = an id-ordered prefix sum over ONE (group, quality)
    // bin per group. A plain window partitioned by (group, quality) puts
    // that whole bin on one task — fine for balanced corpora, a serial
    // bottleneck when one bin dominates (a single source at uniform
    // quality). Distributed prefix-sum instead: range-partition by
    // (group, id), per-partition subtotals (one tiny agg: |groups| x P
    // rows), cumulative offsets via a window over partition IDs, then a
    // per-row running sum WITHIN each range partition — every task's
    // window is bounded by |bin|/P, never the bin. bin_cum is invariant
    // to where the sampled range boundaries fall (offset + local sum =
    // total sum over smaller ids), so output matches the naive window
    // bit-for-bit; the localCheckpoint pins one sampled partitioning so
    // the subtotal job and the fill job cannot disagree on boundaries.
    val bd = joined.filter(col("is_boundary"))
      .select("group", "id", "quality", "tokens", "remaining")
    val ranged = bd
      .repartitionByRange(col("group"), col("id"))
      .withColumn("__part", spark_partition_id())
      .localCheckpoint()
    val byPart = Window.partitionBy("group").orderBy(col("__part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("group", "__part")
      .agg(sum(col("tokens")).as("psum"))
      .withColumn("offset", coalesce(sum(col("psum")).over(byPart), lit(0L)))
      .select("group", "__part", "offset")
    val withinPart = Window.partitionBy("group", "__part").orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val boundaryDocs = ranged.join(broadcast(offsets), Seq("group", "__part"))
      .withColumn("bin_cum", col("offset") + sum(col("tokens")).over(withinPart))
      .filter(col("bin_cum") <= col("remaining"))
      .select("group", "id", "quality", "tokens")
    fullDocs.unionByName(boundaryDocs)
  }

  /** Per-domain token cap — unbiased deterministic downsampling: no group
    * (domain/source) contributes more than `cap` tokens, selection ordered
    * by (md5-derived hash bucket, id) so it favors no quality signal and
    * reproduces on any partitioning. Delegates to [[tokenBudgetFill]] with
    * quality = -(hash % buckets): the bucket count (default 4096) keeps the
    * per-(group, quality) bins COARSE, which is what makes the threshold
    * form scale — unique per-doc order keys would collapse it back into a
    * whole-group window.
    *
    * Input columns: (id, group, tokens); output: the kept rows with the
    * bucket-derived `quality` column retained.
    */
  def domainTokenCap(
      docs: DataFrame, idCol: Column, cap: Long, buckets: Int = 4096): DataFrame = {
    val h = graft.functions.TextFunctions.stableHash32(idCol.cast("string"))
    tokenBudgetFill(
      docs.withColumn("quality", -(h % lit(buckets.toLong)).cast("double")), cap)
  }

  /** Temperature-scaled mixture budgets — the classic training-mixture
    * recipe: group g with n_g tokens gets sampling weight ∝ n_g^alpha
    * (alpha 1 = proportional/natural, 0 = uniform across groups; 0.3–0.7
    * is the usual multilingual smoothing band), and a token budget
    * weight·targetTokens, capped at the group's capacity (no repetition —
    * `epochs` reports how much upsampling the uncapped share implies).
    *
    * Determinism across engines/partitionings: weights are QUANTIZED to
    * integer micro-weights (round(n^alpha · quantum)) so the split is pure
    * integer arithmetic — an exact sum and an exact integral division,
    * reproducible bit-for-bit in any SQL oracle; floating error can only
    * flip a result if n^alpha · quantum lands within one pow() ulp of a
    * .5 boundary (~1e-9 per group). The group aggregate is tiny
    * (|groups| rows), so every step after it is driver-scale.
    *
    * Input: (group, tokens) rows (plus anything else, ignored).
    * Output: (group, n_tokens, weight, budget, epochs).
    */
  def temperatureBudgets(
      docs: DataFrame,
      alpha: Double,
      targetTokens: Long,
      quantum: Long = 1000000L): DataFrame = {
    val g = docs.groupBy("group").agg(sum(col("tokens")).as("n_tokens"))
    val w = g.withColumn("w",
      round(pow(col("n_tokens").cast("double"), lit(alpha)) * lit(quantum.toDouble), 0)
        .cast("long"))
    val tot = w.agg(sum(col("w")).as("tot"))
    w.crossJoin(broadcast(tot))
      .withColumn("budget_uncapped",
        expr(s"CAST(CAST(w AS DECIMAL(38,0)) * CAST($targetTokens AS DECIMAL(38,0)) " +
          "div CAST(tot AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("budget", least(col("budget_uncapped"), col("n_tokens")))
      .withColumn("weight",
        round(col("w").cast("double") / col("tot").cast("double"), 9))
      .withColumn("epochs",
        round(col("budget_uncapped").cast("double") / col("n_tokens").cast("double"), 6))
      .select("group", "n_tokens", "weight", "budget", "epochs")
  }

  /** Temperature-mixture selection: [[temperatureBudgets]] for the split,
    * unbiased hash-ordered [[tokenBudgetFillPerGroup]] for the picks (the
    * [[domainTokenCap]] ordering — favors no quality signal, reproduces on
    * any partitioning). One corpus pass builds the narrow base; the budget
    * aggregate and the fill both read the checkpointed frame.
    *
    * Input: (id, group, tokens); output: kept rows with the bucket-derived
    * `quality` order key retained.
    */
  def temperatureMixture(
      docs: DataFrame,
      alpha: Double,
      targetTokens: Long,
      buckets: Int = 4096,
      quantum: Long = 1000000L): DataFrame = {
    val h = graft.functions.TextFunctions.stableHash32(col("id").cast("string"))
    val base = narrowBase(
      docs.withColumn("quality", -(h % lit(buckets.toLong)).cast("double")))
    val budgets = temperatureBudgets(base, alpha, targetTokens, quantum)
    fillFromBase(base, budgets.select("group", "budget"))
  }

  /** Deterministic export sharding: assign every document a shard in
    * [0, nShards) and a stable pseudo-random position within the shard —
    * the "shuffle the corpus for training" step, reproducible on any
    * cluster/partitioning because both keys derive from the document id
    * (md5-based stableHash32, oracle-replayable). At 100 TB nShards is
    * chosen for the trainer's shard size (thousands), so the per-shard
    * row_number window is bounded by shard size, never the corpus.
    */
  def exportShards(docs: DataFrame, idCol: Column, nShards: Int): DataFrame = {
    val h = graft.functions.TextFunctions.stableHash32(idCol.cast("string"))
    val h2 = graft.functions.TextFunctions.stableHash32b(idCol.cast("string"))
    val byShard = Window.partitionBy("shard").orderBy(col("__ord"), col("__id"))
    docs
      .withColumn("shard", pmod(h, lit(nShards)).cast("int"))
      .withColumn("__ord", h2)
      .withColumn("__id", idCol.cast("string"))
      .withColumn("pos", row_number().over(byShard).cast("long"))
      .drop("__ord", "__id")
  }

  /** Materialize the [[exportShards]] layout to disk: one parquet
    * directory per shard (`shard=<s>/`), rows laid down in `pos` order so
    * a trainer streaming a shard file reads the deterministic shuffle
    * order without sorting. The write itself is the shard-keyed exchange
    * [[exportShards]]'s window already paid — repartitioning by shard
    * before `partitionBy` keeps one task per shard (one output file per
    * shard directory, no tiny-file spray), and per-task work is bounded
    * by shard size, which `nShards` is chosen to cap.
    */
  def writeShards(docs: DataFrame, idCol: Column, nShards: Int, path: String): Unit =
    exportShards(docs, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
