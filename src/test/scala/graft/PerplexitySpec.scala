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

  test("kneser-ney: hand-computed interpolated probability and backoff") {
    import spark.implicits._
    // reference: "aa bb", "aa bb", "aa cc" -> bigrams (aa,bb) c12=2, (aa,cc) c12=1
    // ctx aa: c1=3, n1r=2; cont: bb nl=1, cc nl=1; B=2 types, W=2 types
    val ref = Seq(
      (1L, Seq("aa", "bb")), (2L, Seq("aa", "bb")), (3L, Seq("aa", "cc")))
      .toDF("id", "toks")
    val lm = Perplexity.trainKn(ref)
    // doc: ["aa","bb"]: P = max(2-.75,0)/3 + .75*2/3 * (1+1)/(2+2+1)
    val pSeen = 1.25 / 3.0 + 0.5 * (2.0 / 5.0)
    // doc: ["aa","zz"]: c12=0 -> discounted term 0, backoff with nl(zz)=0
    val pBackoff = 0.0 + 0.75 * 2.0 / 3.0 * (1.0 / 5.0)
    // doc: ["zz","bb"]: unseen context -> pure continuation (1+1)/5
    val pUnseenCtx = 2.0 / 5.0
    val docs = Seq(
      (10L, Seq("aa", "bb")), (11L, Seq("aa", "zz")), (12L, Seq("zz", "bb")))
      .toDF("id", "toks")
    val got = Perplexity.scoreKn(docs, lm).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(10L) == math.floor(-math.log(pSeen) * 1e6).toLong)
    assert(got(11L) == math.floor(-math.log(pBackoff) * 1e6).toLong)
    assert(got(12L) == math.floor(-math.log(pUnseenCtx) * 1e6).toLong)
    // the KN property: high-count-one-context vs spread continuation.
    // "xx" follows ONE context 5 times; "yy" follows 3 different contexts
    // once each -> Pcont(yy) > Pcont(xx) despite lower raw frequency.
    val ref2 = (1 to 5).map(i => (i.toLong, Seq("ctx", "xx"))) ++
      Seq((6L, Seq("p1", "yy")), (7L, Seq("p2", "yy")), (8L, Seq("p3", "yy")))
    val lm2 = Perplexity.trainKn(ref2.toDF("id", "toks"))
    val probe = Seq((20L, Seq("novel", "xx")), (21L, Seq("novel", "yy")))
      .toDF("id", "toks")
    val s2 = Perplexity.scoreKn(probe, lm2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s2(21L) < s2(20L),
      "continuation-diverse word must score MORE probable after an unseen context")
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
