package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary coverage — the tokenizer-design statistic: how many of the
  * most frequent token types cover 50% / 90% / 95% / 99% of the corpus's
  * token mass (drives vocab-size choices and OOV-rate estimates).
  *
  * Scale shape: the naive form sorts the whole vocabulary by frequency
  * and walks a cumulative sum — a corpus-sized ordered window. This
  * implementation needs only the COUNT-OF-COUNTS: one keyed (token)
  * aggregation, then one tiny (distinct frequency values — Zipf corpora
  * have O(1000)s of them regardless of vocab size) aggregation, and the
  * coverage curve resolves on the driver with exact integer arithmetic:
  * within a same-frequency block, k types cover k·f tokens, so the
  * minimal rank hitting a target is ceil((target·T − cumBefore)/f) plus
  * the types before the block. Identical to the full-sort answer,
  * without ever ordering the vocabulary.
  *
  * Input: (id, toks); output one row per target —
  * (coverage_target, vocab_needed, vocab_size, tokens_total).
  */
object Vocab {

  def coverage(
      docsToks: DataFrame,
      targets: Seq[Double] = Seq(0.5, 0.9, 0.95, 0.99)): DataFrame = {
    require(targets.nonEmpty && targets.forall(t => t > 0.0 && t <= 1.0),
      s"targets must lie in (0, 1]: $targets")
    val spark = docsToks.sparkSession
    import spark.implicits._
    // count-of-counts: |{token types with frequency f}| per f — the only
    // collected frame, bounded by distinct frequency values, not vocab
    val cc = docsToks
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .groupBy("f").agg(count(lit(1)).as("types"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val tokensTotal = cc.map { case (f, t) => f * t }.sum
    val vocabSize = cc.map(_._2).sum
    val rows = targets.sorted.map { target =>
      // need = ceil(target * tokensTotal) in DOUBLE arithmetic — the form
      // a SQL oracle computes. (Decimal-exact ceil would disagree exactly
      // when target·T is an integer and the double for `target` sits a
      // hair above its decimal value — 0.9 does.)
      val need = math.ceil(target * tokensTotal.toDouble).toLong
      var cum = 0L
      var ranks = 0L
      var answer = vocabSize // everything, if target needs the full mass
      var found = false
      for ((f, types) <- cc if !found) {
        val blockMass = f * types
        if (cum + blockMass >= need) {
          val inBlock = (need - cum + f - 1) / f // ceil over longs
          answer = ranks + math.max(inBlock, 0L)
          found = true
        } else { cum += blockMass; ranks += types }
      }
      (target, answer, vocabSize, tokensTotal)
    }
    rows.toDF("coverage_target", "vocab_needed", "vocab_size", "tokens_total")
  }
}
