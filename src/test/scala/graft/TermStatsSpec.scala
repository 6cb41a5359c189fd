package graft

import org.apache.spark.sql.functions._
import graft.functions.LangId
import graft.operators.Keywords

/** Term-statistics operators: TF-IDF keywords and PMI collocations
  * against hand-computed values, and the trigram-profile language
  * classifier against distinctive sentences per language.
  */
class TermStatsSpec extends SparkSpec {

  import spark.implicits._

  test("tfidf: corpus-unique term outranks ubiquitous term, hand-checked value") {
    // "apple" appears in every doc (df=3 → idf=ln(4/4)=0); "kiwi" only in
    // doc 1 (df=1 → idf=ln(4/2)); "pear" twice in doc 1.
    val docs = Seq(
      (1L, Seq("apple", "kiwi", "pear", "pear")),
      (2L, Seq("apple", "pear")),
      (3L, Seq("apple"))).toDF("id", "toks")
    val out = Keywords.tfidfTopK(docs, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
    // kiwi: 1·ln(4/2)=0.693 beats pear: 2·ln(4/3)=0.575
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._3) == Seq("kiwi", "pear"), s"got $doc1")
    val kiwi = doc1.find(_._3 == "kiwi").get._4
    assert(math.abs(kiwi - 1.0 * math.log(4.0 / 2.0)) < 1e-12)
    val pear = doc1.find(_._3 == "pear").get._4
    assert(math.abs(pear - 2.0 * math.log(4.0 / 3.0)) < 1e-12)
    // the everywhere-term scores ln(1)=0 and only surfaces when nothing
    // else is left (doc 3 has nothing but "apple")
    assert(out.filter(_._1 == 3L).map(_._3) == Seq("apple"))
  }

  test("pmi: always-together pair beats independent pair; minCount prunes") {
    // "data science" always adjacent; "the" pairs with everything.
    val rows = (0 until 30).map(i => (i.toLong, Seq("data", "science", "the", s"w$i"))) ++
      (30 until 40).map(i => (i.toLong, Seq("the", s"w$i")))
    val docs = rows.toDF("id", "toks")
    val out = Keywords.pmiCollocations(docs, 10, 5L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    // top collocation is the perfectly-correlated pair
    assert((out.head._2, out.head._3) == ("data", "science"), s"got ${out.head}")
    // every surviving pair respects minCount
    assert(out.forall(_._4 >= 5))
    // hand-check the winner: c_ab=30, c_a=c_b=30, T=30·4+10·2=140 tokens,
    // B=30·3+10·1=100 bigrams
    val expect = math.log(30.0) + 2 * math.log(140.0) - math.log(100.0) -
      math.log(30.0) - math.log(30.0)
    assert(math.abs(out.head._5 - expect) < 1e-9, s"got ${out.head._5} want $expect")
  }

  test("langid: distinctive sentences classify to their language") {
    val docs = Seq(
      (1L, "The people who would have been there said that they could never find the way home."),
      (2L, "Die Kinder haben gesagt, dass sie nicht wissen, wo der Zug zwischen den Städten fährt."),
      (3L, "Les enfants qui sont dans la maison ne peuvent pas trouver le chemin pour aller à l'école."),
      (4L, "Los niños que están en la casa no pueden encontrar el camino para llegar a la escuela."),
      (5L, "I bambini che sono nella casa non possono trovare la strada per arrivare alla scuola."),
      (6L, "As crianças que estão em casa não podem encontrar o caminho para chegar à escola."),
      (7L, "")).toDF("id", "text")
    val got = LangId.classify(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en", s"en got ${got(1L)}")
    assert(got(2L) == "de", s"de got ${got(2L)}")
    assert(got(3L) == "fr", s"fr got ${got(3L)}")
    assert(got(4L) == "es", s"es got ${got(4L)}")
    assert(got(5L) == "it", s"it got ${got(5L)}")
    assert(got(6L) == "pt", s"pt got ${got(6L)}")
    assert(got(7L) == "unknown")
  }

  test("charTrigrams: native expression matches the substring sweep, edge cases") {
    import graft.functions.TextExpressions
    val df = Seq("hello world", "ab", "abc", "", "xyzw").toDF("s")
    val got = df.select(col("s"), TextExpressions.charTrigrams(col("s")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    def naive(s: String) = (0 to s.length - 3).map(i => s.substring(i, i + 3))
    got.foreach { case (s, t) => assert(t == naive(s), s"mismatch for '$s'") }
    assert(got("ab").isEmpty && got("").isEmpty)
    assert(got("abc") == Seq("abc"))
    // null-safe
    val withNull = Seq(Some("abcd"), None).toDF("s")
    val n = withNull.select(TextExpressions.charTrigrams(col("s"))).collect()
    assert(n.exists(_.isNullAt(0)))
  }

  test("langid: profiles are deterministic and ASCII-only") {
    assert(LangId.profiles.size == 6)
    LangId.profiles.foreach { case (lang, ps) =>
      assert(ps.size == LangId.ProfileSize, s"$lang profile size ${ps.size}")
      assert(ps.forall { case (tri, _) => tri.length == 3 && tri.forall(c => c == ' ' || ('a' <= c && c <= 'z')) })
      // rank weights descend from ProfileSize to 1
      assert(ps.map(_._2) == (LangId.ProfileSize to 1 by -1))
    }
  }

  test("gopher rules: each rule trips on its crafted document") {
    import graft.dedup.CorpusFilters
    val good = ("w1", ("the cat sat of the mat and that dog ran with play " * 5).trim)
    val tooShort = ("w2", "the of and that have")
    val longWords = ("w3", Array.fill(30)("pneumonoultramicroscopic").mkString(" ") +
      " the of and that")
    val symbols = ("w4", Array.fill(30)("## ... ##").mkString(" ") + " the of")
    val bullets = ("w5", (1 to 30).map(i => s"- item $i of the list and that").mkString("\n"))
    val nonAlpha = ("w6", (1 to 30).map(_.toString * 2).mkString(" ") + " the of and")
    val noStops = ("w7", Array.fill(30)("zebra quartz").mkString(" "))
    val docs = Seq(good, tooShort, longWords, symbols, bullets, nonAlpha, noStops)
      .toDF("id", "content")
    val out = CorpusFilters.gopherRules(docs, minWords = 20).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("w1").getAs[Boolean]("keep"), "clean doc passes all rules")
    assert(!out("w2").getAs[Boolean]("pass_words") && !out("w2").getAs[Boolean]("keep"))
    assert(!out("w3").getAs[Boolean]("pass_meanlen"))
    assert(!out("w4").getAs[Boolean]("pass_symbol"))
    assert(!out("w5").getAs[Boolean]("pass_bullet"))
    assert(!out("w6").getAs[Boolean]("pass_alpha"))
    assert(!out("w7").getAs[Boolean]("pass_stops"))
    // hand-check one stat: w1 repeats a 12-word sentence 5 times -> 60 words
    assert(out("w1").getAs[Long]("n_words") == 60L)
    // empty text: all zero stats, fails word count, no NaN/null anywhere
    val empty = CorpusFilters.gopherRules(Seq(("e", "")).toDF("id", "content"),
      minWords = 20).collect().head
    assert(empty.getAs[Long]("n_words") == 0L && !empty.getAs[Boolean]("keep"))
    assert(!empty.anyNull)
  }

  test("phrase search: adjacency and order required; repeats; snippet window") {
    import graft.search.Lexical
    val docs = Seq(
      (1L, "alpha beta gamma delta"),        // "beta gamma" at pos 1
      (2L, "gamma beta alpha"),              // reversed: no match
      (3L, "beta xx gamma"),                 // not adjacent: no match
      // (separator must survive the >=2-char tokenizer: adjacency is
      // post-tokenization, same as the oracle)
      (4L, "beta gamma beta gamma"),         // two occurrences
      (5L, "the the end")).toDF("id", "content")
    val out = Lexical.phraseSearch(docs, Seq(0 -> "beta gamma", 1 -> "the the"),
      k = 10, window = 1).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4)))
    val q0 = out.filter(_._1 == 0).sortBy(_._2)
    assert(q0.map(_._2).toSeq == Seq(1L, 4L), s"got ${q0.toSeq}")
    assert(q0.find(_._2 == 4L).get._3 == 2L, "two occurrences counted")
    assert(q0.find(_._2 == 1L).get._4 == 1, "first_pos is 0-based token index")
    // snippet: window 1 around "beta gamma" in doc 1 -> "alpha beta gamma delta"
    assert(q0.find(_._2 == 1L).get._5 == "alpha beta gamma delta")
    // repeated-term phrase matches doc 5 only ("the the")
    val q1 = out.filter(_._1 == 1)
    assert(q1.map(_._2).toSeq == Seq(5L), s"got $q1")
    // phrase ranking: higher phrase_tf first
    val ranked = out.filter(_._1 == 0)
    assert(ranked.maxBy(_._3)._2 == 4L)
  }

  test("histogram: integer-exact bins, max in last bin, singleton group") {
    import graft.operators.Profile
    val df = (Seq.tabulate(20)(i => ("a", i.toLong)) :+ ("b", 7L))
      .toDF("g", "v")
    val out = Profile.histogram(df, "g", "v", nBins = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // group a: values 0..19, width ceil(20/4)=5 -> bins [0,4][5,9][10,14][15,19], 5 each
    val a = out.filter(_._1 == "a").sortBy(_._2)
    assert(a.map(t => (t._2, t._3, t._4, t._5)).toSeq ==
      Seq((0L, 0L, 4L, 5L), (1L, 5L, 9L, 5L), (2L, 10L, 14L, 5L), (3L, 15L, 19L, 5L)))
    // group b: single value -> width 1, one bin holding it
    val b = out.filter(_._1 == "b")
    assert(b.toSeq == Seq(("b", 0L, 7L, 7L, 1L)))
    // totals preserved
    assert(out.map(_._5).sum == 21L)
  }

  test("tfidf/pmi: empty and single-token documents contribute nothing but survive") {
    val docs = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("solo")),
      (3L, Seq("alpha", "beta"))).toDF("id", "toks")
    val kw = Keywords.tfidfTopK(docs, 3).collect()
    assert(!kw.exists(_.getLong(0) == 1L), "empty doc has no keywords")
    assert(kw.exists(_.getLong(0) == 2L))
    val pmi = Keywords.pmiCollocations(docs, 5, 1L).collect()
    assert(pmi.length == 1) // only (alpha, beta) exists as a bigram
    assert(pmi.head.getString(1) == "alpha" && pmi.head.getString(2) == "beta")
  }
}
