package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm

/** Unigram-LM tokenizer training: integer Viterbi semantics (min cost,
  * longest-piece tie-break), seeding/coverage invariants, and the EM
  * usage re-estimation.
  */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  test("viterbi: picks the cheapest segmentation, hand-checked") {
    // costs: 'ab' much cheaper than 'a'+'b'
    val costs = Map("a" -> 10L, "b" -> 10L, "ab" -> 3L, "abab" -> 100L)
    val (pieces, cost) = UnigramLm.viterbi("abab", costs, 4)
    assert(pieces == Seq("ab", "ab"))
    assert(cost == 6L)
    // make the whole word cheapest and it wins
    val (p2, c2) = UnigramLm.viterbi("abab", costs + ("abab" -> 5L), 4)
    assert(p2 == Seq("abab") && c2 == 5L)
  }

  test("viterbi: equal-cost tie goes to the longest piece") {
    // "aa" via [aa] costs 20, via [a,a] costs 20 — the single long piece wins
    val costs = Map("a" -> 10L, "aa" -> 20L)
    val (pieces, cost) = UnigramLm.viterbi("aa", costs, 4)
    assert(pieces == Seq("aa"), s"got $pieces")
    assert(cost == 20L)
  }

  test("viterbi: single-char coverage segments any word") {
    val costs = Map("x" -> 5L, "y" -> 7L, "z" -> 9L)
    val (pieces, cost) = UnigramLm.viterbi("zyx", costs, 4)
    assert(pieces == Seq("z", "y", "x") && cost == 21L)
  }

  test("seeding: single chars always kept, rare long pieces pruned") {
    val docs = Seq((1L, Seq("abc", "abd")), (2L, Seq("abc"))).toDF("id", "toks")
    val words = UnigramLm.wordTable(docs)
    val seed = UnigramLm.seedPieces(words, maxLen = 4, minCount = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // chars survive regardless of count ('d' appears once)
    assert(seed.contains("d") && seed("d") == 1L)
    // 'ab' occurs in all 3 word instances
    assert(seed("ab") == 3L)
    // 'abd' total freq 1 < minCount and len > 1 -> pruned
    assert(!seed.contains("abd"))
    assert(seed.contains("abc")) // freq 2
  }

  test("train: one EM round concentrates usage on winning pieces; chars survive") {
    val docs = Seq(
      (1L, Seq("abab", "abab", "cd")),
      (2L, Seq("abab", "cd", "cd"))).toDF("id", "toks")
    val out = UnigramLm.train(docs, rounds = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPiece = out.map(t => t._1 -> t).toMap
    // every piece in the output has smoothed mass; all 4 chars present
    assert(Seq("a", "b", "c", "d").forall(byPiece.contains))
    // 'abab' (freq 3 >= 2) is seedable and wins its own word -> usage 3
    assert(byPiece("abab")._2 == 3L, s"got ${byPiece.get("abab")}")
    assert(byPiece("cd")._2 == 3L)
    // unused chars have usage 0 but remain (add-one smoothing)
    assert(byPiece("a")._2 == 0L)
    // cheaper cost for the higher-usage piece — equal here, so compare
    // against a char with zero usage instead
    assert(byPiece("abab")._3 < byPiece("a")._3)
    // two rounds converge to the same winners on this corpus
    val out2 = UnigramLm.train(docs, rounds = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out2("abab") == 3L && out2("cd") == 3L)
  }

  test("train is partitioning-invariant (distributed-determinism contract)") {
    val docs = Seq(
      (1L, Seq("alpha", "beta", "alphabet")),
      (2L, Seq("beta", "beta", "alpha")),
      (3L, Seq("gamma", "alphabet", "delta"))).toDF("id", "toks")
    def table(parts: Int) =
      UnigramLm.train(docs.repartition(parts), rounds = 2).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(table(1) == table(7))
  }

  test("segmentWords: output shape and per-word costs are consistent") {
    val docs = Seq((1L, Seq("hello", "hello", "help"))).toDF("id", "toks")
    val words = UnigramLm.wordTable(docs)
    val costs = UnigramLm.costTable(UnigramLm.seedPieces(words))
    val seg = UnigramLm.segmentWords(words, costs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3), r.getLong(4)))
    assert(seg.length == 2)
    val costMap = costs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    seg.foreach { case (word, _, pieces, nPieces, cost) =>
      val ps = pieces.split(" ").toSeq
      assert(ps.mkString("") == word, s"pieces must tile the word: $word -> $pieces")
      assert(ps.length == nPieces)
      assert(ps.map(costMap).sum == cost, "reported cost equals sum of piece costs")
    }
  }

  test("maxMatch greedy: longest piece wins, char fallback, tiles the word") {
    val vocab = Set("ab", "abc", "b", "c", "d")
    assert(UnigramLm.maxMatch("abcd", vocab, 4) == Seq("abc", "d"),
      "longest match at position 0")
    assert(UnigramLm.maxMatch("abxd", vocab, 4) == Seq("ab", "x", "d"),
      "uncovered char falls back to itself")
    // greedy can be WORSE than optimal: 'ab'+... leaves 'cb' uncovered
    val v2 = Set("ab", "a", "bcb", "b", "c")
    assert(UnigramLm.maxMatch("abcb", v2, 4) == Seq("ab", "c", "b"),
      "no backtracking: greedy misses a + bcb")
  }

  test("segmentWordsGreedy tiles every word and matches maxMatch") {
    val words = Seq(("interna", 3L), ("data", 2L), ("spark", 1L)).toDF("word", "n")
    val pieces = UnigramLm.seedPieces(words)
    val vocab = pieces.select("piece").collect().map(_.getString(0)).toSet
    val seg = UnigramLm.segmentWordsGreedy(words, pieces)
      .collect().map(r => (r.getString(0), r.getString(2), r.getInt(3)))
    seg.foreach { case (word, ps, n) =>
      val expect = UnigramLm.maxMatch(word, vocab, 4)
      assert(ps.split(" ").toSeq == expect, s"$word")
      assert(n == expect.length)
      assert(expect.mkString("") == word)
    }
  }
}
