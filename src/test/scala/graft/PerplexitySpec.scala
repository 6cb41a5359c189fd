package graft

import org.apache.spark.sql.functions._
import graft.dedup.{CorpusFilters, Perplexity}

class PerplexitySpec extends SparkSpec {

  private def toks(rows: (Long, String)*) = {
    import spark.implicits._
    CorpusFilters.tokenized(rows.toDF("id", "content"))
  }

  test("bigram LM score: hand-computed add-one probabilities") {
    // reference "aa bb aa": bigrams (aa,bb),(bb,aa) — c12 both 1,
    // context counts aa=1 bb=1, vocab {aa,bb} V=2
    val lm = Perplexity.train(toks(1L -> "aa bb aa"))
    val scored = Perplexity.score(
      toks(10L -> "aa bb",   // seen bigram: p=(1+1)/(1+2)=2/3
           20L -> "aa cc",   // unseen continuation: p=(0+1)/(1+2)=1/3
           30L -> "zz yy"),  // unseen context: p=1/(0+2)=1/2
      lm).collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(scored(10L) == ((1L, math.floor(-math.log(2.0 / 3.0) * 1e6).toLong)))
    assert(scored(20L) == ((1L, math.floor(-math.log(1.0 / 3.0) * 1e6).toLong)))
    assert(scored(30L) == ((1L, math.floor(-math.log(1.0 / 2.0) * 1e6).toLong)))
  }

  test("repeated bigrams multiply occurrences; sub-2-token docs emit no row") {
    val lm = Perplexity.train(toks(1L -> "aa bb"))
    val r = Perplexity.score(toks(10L -> "aa bb aa bb", 20L -> "aa"), lm)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r(10L) == 3L, "aa-bb, bb-aa, aa-bb = 3 bigram slots")
    assert(!r.contains(20L), "single-token doc has no bigrams")
  }

  test("head/middle/tail thirds cut by integer rank within group") {
    val lm = Perplexity.train(toks(1L -> "aa bb aa"))
    val scored = Perplexity.score(
      toks(10L -> "aa bb", 20L -> "aa cc", 30L -> "zz yy"), lm)
      .withColumn("lang", lit("en"))
    val b = Perplexity.buckets(scored).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    // ascending nll: 10 (ln 1.5) < 30 (ln 2) < 20 (ln 3)
    assert(b == Map(10L -> "head", 30L -> "middle", 20L -> "tail"))
  }
}
