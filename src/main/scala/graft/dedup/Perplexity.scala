package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality filtering (Wenzek et al. 2019,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data"): score every document by its perplexity under a small LM
  * trained on a trusted reference slice, then split each language into
  * head / middle / tail quality buckets. CCNet uses a 5-gram KenLM over
  * Wikipedia; this engine expresses the same pipeline shape with an
  * add-one-smoothed token-bigram model — the statistic changes, the
  * dataflow (train counts → score corpus → per-language bucketing) is
  * the one that matters at 100 TB.
  *
  * Determinism: per-document scores are summed in MICRO-NATS (each
  * bigram's −ln p is floored to an integer number of 1e-6 nats before
  * the sum), so the aggregation is exact integer arithmetic — immune to
  * floating-point non-associativity under Spark's nondeterministic
  * reduce order, and bit-reproducible in the DuckDB oracle.
  *
  * Scale shape: training is two keyed aggregations over the reference
  * slice (bigram and unigram counts, both map-side combinable). Scoring
  * aggregates the corpus to per-document bigram multiplicity first (the
  * combiner collapses repetitive documents before any join), then joins
  * counts on w1w2 / w1 — keyed joins that AQE broadcasts when the
  * reference model is small. Bucketing ranks within language; the exact
  * row_number form here is oracle-replayable, and the 100 TB swap-in is
  * approx-percentile cutoffs (same two-sided contract as
  * `TextQueries.textPercentiles`).
  */
object Perplexity {

  /** Smoothed bigram counts from a reference corpus, as one frame:
    * (w1, w2, c12, c1) plus a single-row vocab frame (v). Inputs are
    * (id, toks) in [[CorpusFilters.tokenized]] shape.
    */
  final case class BigramLm(bigrams: DataFrame, unigrams: DataFrame, vocab: DataFrame)

  private def bigramsOf(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(0), size(toks) - lit(2)), i =>
        struct(element_at(toks, i + 1).as("w1"), element_at(toks, i + 2).as("w2"))))

  /** Train the reference LM: bigram counts, unigram CONTEXT counts
    * (occurrences of w1 with a successor — i.e. all tokens but each
    * document's last), and vocabulary size |V| = distinct tokens in the
    * reference. All three are keyed aggregations with map-side combine;
    * nothing is collected to the driver.
    */
  def train(refToks: DataFrame): BigramLm = {
    val pairs = refToks
      .select(explode(bigramsOf(col("toks"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    // context counts derive from the checkpointed TYPE table (sum of c12
    // per w1 == pair count per w1), so the corpus-scale pair aggregation
    // runs once, not once per derived frame — the [[trainKn]] lesson
    val bigrams = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val unigrams = bigrams.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = refToks
      .select(explode(col("toks")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    BigramLm(bigrams, unigrams, vocab)
  }

  /** Score a corpus under the LM: one row per document with at least one
    * bigram — (id, n_bigrams, nll_micro, avg_nll) where
    * avg_nll = nll_micro / (n_bigrams * 1e6) is the mean negative log
    * likelihood per bigram in nats (monotone in perplexity: ppl =
    * exp(avg_nll)). Unknown contexts/continuations fall back to the
    * add-one floor 1/(c1+V) with c12 = 0, c1 = 0 for unseen w1.
    */
  def score(docsToks: DataFrame, lm: BigramLm): DataFrame = {
    val occ = docsToks
      .select(col("id"), explode(bigramsOf(col("toks"))).as("b"))
      .groupBy(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("occ"))
    val termMicro =
      floor(-log((coalesce(col("c12"), lit(0L)) + lit(1)).cast("double") /
        (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * lit(1e6))
        .cast("long")
    occ
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(lm.unigrams, Seq("w1"), "left")
      .crossJoin(broadcast(lm.vocab))
      .select(col("id"), col("occ"), termMicro.as("t_micro"))
      .groupBy("id")
      .agg(sum("occ").as("n_bigrams"),
        sum(col("occ") * col("t_micro")).as("nll_micro"))
      .select(col("id"), col("n_bigrams"), col("nll_micro"),
        (col("nll_micro").cast("double") /
          (col("n_bigrams").cast("double") * 1e6)).as("avg_nll"))
  }

  /** Interpolated Kneser–Ney bigram model (the KenLM smoothing family
    * CCNet's real 5-gram LM uses, at bigram order): discounted bigram
    * probability backed off to the CONTINUATION distribution —
    *
    *   P(w2|w1) = max(c12 − D, 0)/c1 + D·N1+(w1·)/c1 · Pcont(w2)
    *   Pcont(w2) = (N1+(·w2) + 1) / (B + W + 1)      (add-one: OOV > 0)
    *   unseen w1 → Pcont(w2)
    *
    * with D = 0.75 (exact in binary), B = bigram types, W = continuation
    * types. Continuation counts are what distinguish KN from add-one:
    * a word frequent in ONE context ("Francisco") stops looking probable
    * everywhere. All frames are keyed aggregations over the bigram-type
    * table (vocabulary-scale, not corpus-scale).
    */
  final case class KnLm(bigrams: DataFrame, contexts: DataFrame,
      continuation: DataFrame, totals: DataFrame)

  val KnDiscount = 0.75

  def trainKn(refToks: DataFrame): KnLm = {
    val pairs = refToks
      .select(explode(bigramsOf(col("toks"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    // the TYPE table feeds four downstream frames (itself, contexts,
    // continuation, totals) — without materialization each one replays the
    // corpus-scale pair aggregation (measured 34 s -> 7.9 s at the 64x
    // sweep point). The table is vocabulary-sized: checkpointing it is
    // cheap by construction.
    val bigrams = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    // per-context totals AND distinct-successor counts from the TYPE table
    val contexts = bigrams.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1r"))
    val continuation = bigrams.groupBy(col("w2"))
      .agg(count(lit(1)).as("nl"))
    val totals = bigrams.agg(count(lit(1)).as("b_types"))
      .crossJoin(continuation.agg(count(lit(1)).as("w_types")))
    KnLm(bigrams, contexts, continuation, totals)
  }

  /** Score a corpus under a KN model — same output contract as [[score]]
    * (micro-nat integer sums, one row per document with ≥ 1 bigram).
    */
  def scoreKn(docsToks: DataFrame, lm: KnLm): DataFrame = {
    val occ = docsToks
      .select(col("id"), explode(bigramsOf(col("toks"))).as("b"))
      .groupBy(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("occ"))
    val pcont = (coalesce(col("nl"), lit(0L)) + lit(1)).cast("double") /
      (col("b_types") + col("w_types") + lit(1)).cast("double")
    val p = when(col("c1").isNull, pcont).otherwise(
      greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(KnDiscount), lit(0.0)) /
        col("c1").cast("double") +
        lit(KnDiscount) * col("n1r").cast("double") / col("c1").cast("double") * pcont)
    val termMicro = floor(-log(p) * lit(1e6)).cast("long")
    occ
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(lm.contexts, Seq("w1"), "left")
      .join(lm.continuation, Seq("w2"), "left")
      .crossJoin(broadcast(lm.totals))
      .select(col("id"), col("occ"), termMicro.as("t_micro"))
      .groupBy("id")
      .agg(sum("occ").as("n_bigrams"),
        sum(col("occ") * col("t_micro")).as("nll_micro"))
      .select(col("id"), col("n_bigrams"), col("nll_micro"),
        (col("nll_micro").cast("double") /
          (col("n_bigrams").cast("double") * 1e6)).as("avg_nll"))
  }

  /** CCNet head/middle/tail split per group (language): rank documents by
    * (avg_nll ASC, id) within each group and cut at thirds with integer
    * arithmetic (rn*3 <= n → head; rn*3 <= 2n → middle; else tail), so
    * bucket boundaries are exact — no interpolated-percentile float
    * comparisons to drift between engines. `scored` is [[score]] output
    * joined with a group column.
    */
  def buckets(scored: DataFrame, groupCol: String = "lang"): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("avg_nll"), col("id"))
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("bucket",
        when(col("rn") * 3 <= col("n"), lit("head"))
          .when(col("rn") * 3 <= col("n") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .drop("rn", "n")
  }
}
