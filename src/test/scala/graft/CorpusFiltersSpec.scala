package graft

import org.apache.spark.sql.functions._
import graft.dedup.CorpusFilters

class CorpusFiltersSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def doc(id: Long, text: String) = (id, text)

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "content")
  }

  test("repetition signals: hand-computed fractions, repeats counted") {
    // "a b a b a" -> 2-grams: [a b, b a, a b, b a] total=4, distinct=2,
    // dup=0.5, top=0.5; 3-grams: [a b a, b a b, a b a] total=3 distinct=2
    val r = CorpusFilters.repetitionSignals(df(doc(1L, "aa bb aa bb aa")))
      .collect().map(x => (x.getInt(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5))).sortBy(_._1)
    assert(r(0) == ((2, 4L, 2L, 0.5, 0.5)))
    assert(r(1) == ((3, 3L, 2L, 1.0 - 2.0 / 3.0, 2.0 / 3.0)))
  }

  test("repetition signals: short docs emit no row, unique docs score 0") {
    val r = CorpusFilters.repetitionSignals(
      df(doc(1L, "aa"), doc(2L, "aa bb cc dd")))
    val byDoc = r.collect().groupBy(_.getLong(0))
    assert(!byDoc.contains(1L), "1-token doc has no 2-gram slots")
    assert(byDoc(2L).forall(x => x.getDouble(4) == 0.0),
      "all-distinct doc has dup_frac 0")
  }

  test("boilerplate coverage: flagged spans cover positions, union not sum") {
    // "xx yy zz" appears in 3 docs (minDf=3 flags it); doc 4 shares no
    // flagged gram. Doc 1 has the gram at positions 0 and 2 (overlap at
    // pos 2): covered = union [0,2] + [2,4] = 5 of 5 tokens.
    val docs = df(
      doc(1L, "xx yy zz xx yy zz"), // grams at pos 0..3; "xx yy zz" at 0 and 3
      doc(2L, "qq xx yy zz rr"),
      doc(3L, "xx yy zz"),
      doc(4L, "aa bb cc dd"))
    val r = CorpusFilters.boilerplateCoverage(docs, n = 3, minDf = 3)
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getLong(2)))).toMap
    assert(r(1L) == ((6, 6L))) // [0,2]+[3,5] union = all 6
    assert(r(2L) == ((5, 3L))) // [1,3] of 5 tokens
    assert(r(3L) == ((3, 3L)))
    assert(r(4L) == ((4, 0L)), "unflagged doc present with zero coverage")
  }

  test("boilerplate coverage: overlapping occurrences count positions once") {
    // "xx xx xx xx" has "xx xx" at pos 0,1,2 — union covers 4, not 6
    val docs = df(doc(1L, "xx xx xx xx"), doc(2L, "xx xx"), doc(3L, "xx xx"))
    val r = CorpusFilters.boilerplateCoverage(docs, n = 2, minDf = 3)
      .filter(col("id") === 1L).collect().head
    assert(r.getLong(2) == 4L && r.getInt(1) == 4)
  }

  test("boilerplate strip: covered spans cut, order kept, full-coverage empties") {
    val docs = df(
      doc(1L, "aa xx yy zz bb"),  // flagged "xx yy zz" at pos 1 -> keep aa bb
      doc(2L, "xx yy zz"),        // fully covered -> empty
      doc(3L, "cc xx yy zz dd"),
      doc(4L, "qq rr ss tt"))     // untouched
    val r = CorpusFilters.boilerplateStrip(docs, n = 3, minDf = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((2L, "aa bb")))
    assert(r(2L) == ((0L, "")), "fully-boilerplate doc comes out empty")
    assert(r(3L) == ((2L, "cc dd")))
    assert(r(4L) == ((4L, "qq rr ss tt")), "clean doc passes through in token space")
  }

  test("span dedup: keep-first across and within documents") {
    val docs = df(
      doc(1L, "aa bb cc dd"),        // holds the first occurrence of both its grams
      doc(2L, "xx aa bb cc yy"),     // "aa bb cc" repeats doc 1 pos 0 -> cut 1..3
      doc(3L, "aa bb cc dd"),        // full duplicate of doc 1 -> empties
      doc(4L, "pp qq rr ss pp qq rr")) // within-doc repeat at pos 4 -> cut 4..6
    val r = CorpusFilters.spanDedup(docs, k = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((4L, "aa bb cc dd")), "first occurrence survives intact")
    assert(r(2L) == ((2L, "xx yy")))
    assert(r(3L) == ((0L, "")), "exact later duplicate comes out empty")
    assert(r(4L) == ((4L, "pp qq rr ss")), "within-doc repeat keeps the first copy")
  }

  test("span dedup: duplicate-free corpus passes through unchanged") {
    val docs = df(doc(1L, "aa bb cc dd ee"), doc(2L, "ff gg hh ii"))
    val r = CorpusFilters.spanDedup(docs, k = 3)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r(1L) == "aa bb cc dd ee" && r(2L) == "ff gg hh ii")
  }

  test("paragraph dedup: first occurrence wins corpus-wide and within-doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "intro text\nshared boilerplate\nunique one"),
      (2L, "shared boilerplate\nunique two\nshared boilerplate"),
      (3L, "shared boilerplate")) // everything a dup -> empty cleaned
      .toDF("id", "content")
    val out = CorpusFilters.paragraphDedup(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (3L, 3L, "intro text\nshared boilerplate\nunique one"))
    // doc 2: both copies of the shared par lose (doc 1 owns it), order kept
    assert(out(2L) == (3L, 1L, "unique two"))
    assert(out(3L) == (1L, 0L, ""), "fully-deduped doc keeps a row")
  }

  test("c4 rules: line punctuation + word count, page flags, cleaned text") {
    val text = "one two three four five.\nshort.\nno punct line here\nsix seven eight nine!"
    val r = CorpusFilters.c4Rules(df(doc(1L, text)), minLineWords = 3, minSentences = 2)
      .collect().head
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Long]("n_kept") == 2L, "short + unpunctuated lines drop")
    assert(r.getAs[String]("cleaned") ==
      "one two three four five.\nsix seven eight nine!")
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(!r.getAs[Boolean]("has_lorem") && !r.getAs[Boolean]("has_brace"))
    assert(r.getAs[Boolean]("keep"))
    assert(math.abs(r.getAs[Double]("kept_frac") - 0.5) < 1e-12)
  }

  test("c4 rules: lorem ipsum and brace pages rejected, empty doc survives") {
    val rows = CorpusFilters.c4Rules(df(
        doc(1L, "this page has Lorem Ipsum somewhere.\nand a fine second sentence here."),
        doc(2L, "a code page with braces {x}.\nand a fine second sentence here."),
        doc(3L, "")),
      minLineWords = 3, minSentences = 1)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("has_lorem") && !rows(1L).getAs[Boolean]("keep"))
    assert(rows(2L).getAs[Boolean]("has_brace") && !rows(2L).getAs[Boolean]("keep"))
    assert(rows(3L).getAs[Long]("n_lines") == 0L)
    assert(rows(3L).getAs[Double]("kept_frac") == 0.0)
    assert(!rows(3L).getAs[Boolean]("keep"))
  }

  test("lexical diversity: TTR and hapax fraction, empty docs zeroed") {
    // doc 1: tokens [aa bb aa cc] -> 4 tokens, 3 types, hapax {bb, cc}
    val rows = CorpusFilters.lexicalDiversity(df(doc(1L, "aa bb aa cc"), doc(2L, "")))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_tokens") == 4L)
    assert(r1.getAs[Long]("n_types") == 3L)
    assert(r1.getAs[Long]("n_hapax") == 2L)
    assert(math.abs(r1.getAs[Double]("ttr") - 0.75) < 1e-12)
    assert(math.abs(r1.getAs[Double]("hapax_frac") - 2.0 / 3.0) < 1e-12)
    val r2 = rows(2L)
    assert(r2.getAs[Long]("n_tokens") == 0L && r2.getAs[Double]("ttr") == 0.0,
      "empty docs keep a zeroed row — gates must see every document")
  }

  test("readability: hand-computed Flesch and FK grade") {
    // toks = [hello, world, the, cat, sat]: syllable groups 2+1+1+1+1 = 6;
    // sentence runs '.' and '!' = 2; w/s = 2.5, syl/w = 1.2
    val r = CorpusFilters.readability(df(doc(1L, "hello world. the cat sat!")))
      .collect().head
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Long]("n_syllables") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(math.abs(r.getAs[Double]("flesch") -
      (206.835 - 1.015 * 2.5 - 84.6 * 1.2)) < 1e-6)
    assert(math.abs(r.getAs[Double]("fk_grade") -
      (0.39 * 2.5 + 11.8 * 1.2 - 15.59)) < 1e-6)
  }

  test("readability: vowelless tokens count one syllable; empty doc zeroes") {
    val rows = CorpusFilters.readability(df(doc(1L, "42 99"), doc(2L, "")))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_words") == 2L)
    assert(rows(1L).getAs[Long]("n_syllables") == 2L, "digit tokens clamp to 1")
    assert(rows(1L).getAs[Long]("n_sentences") == 1L, "no punctuation = one sentence")
    assert(rows(2L).getAs[Long]("n_words") == 0L)
    assert(rows(2L).getAs[Double]("flesch") == 0.0)
    assert(rows(2L).getAs[Double]("fk_grade") == 0.0)
  }

  test("repetition signals on the documents table are sane") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text").as("content"))
    val r = CorpusFilters.repetitionSignals(docs).cache()
    val n = docs.count()
    assert(r.count() == 2 * n, "every doc has 2- and 3-gram rows at this sf")
    val bad = r.filter(col("dup_frac") < 0 || col("dup_frac") > 1 ||
      col("top_frac") <= 0 || col("top_frac") > 1 ||
      col("distinct_ngrams") > col("total_ngrams")).count()
    assert(bad == 0)
    r.unpersist()
    spark.catalog.clearCache()
  }
}
