package graft

import graft.search.Spell

/** SymSpell deletion-neighborhood corrections vs brute-force Levenshtein
  * over the full vocabulary — the blocking must lose NO candidate.
  */
class SpellSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletes: every ≤maxDist deletion variant, nothing else") {
    assert(Spell.deletes("abc", 1).toSet == Set("abc", "bc", "ac", "ab"))
    assert(Spell.deletes("abc", 2).toSet ==
      Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(Spell.deletes("ab", 3).toSet == Set("ab", "a", "b", ""))
  }

  test("corrections match brute-force Levenshtein over the vocabulary") {
    val docs = Seq(
      "spark spars sharp query queue quack",
      "spark query window winnow widow",
      "spark query table cable fable",
      "query windows sparkle").toDF("content")
    val vocab = docs.as[String].flatMap(_.split(" ")).distinct().collect()
      .map(t => t -> docs.as[String].collect().count(_.split(" ").distinct.contains(t)))
    val terms = Seq("sparc", "qery", "windoe", "zzzzz")
    val got = Spell.corrections(docs, terms, maxDist = 2, topK = 3)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3), r.getLong(4)))
      .toSeq.sortBy(t => (t._1, t._2))
    val expect = terms.flatMap { t =>
      vocab.toSeq
        .map { case (s, f) => (s, lev(t, s), f.toLong) }
        .filter(_._2 <= 2)
        .sortBy { case (s, d, f) => (d, -f, s) }
        .take(3)
        .zipWithIndex
        .map { case ((s, d, f), i) => (t, i + 1, s, d, f) }
    }.sortBy(t => (t._1, t._2))
    assert(got == expect, s"\ngot    $got\nexpect $expect")
  }

  test("guards") {
    val docs = Seq("a b").toDF("content")
    intercept[IllegalArgumentException] {
      Spell.corrections(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Spell.corrections(docs, Seq("x"), maxDist = 0)
    }
  }
}
