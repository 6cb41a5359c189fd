package graft

import graft.operators.Preference

/** Hand fixtures for the preference-pair audits (the oracle queries cover
  * corpus-scale replay; this pins the per-cell arithmetic).
  */
class PreferenceSpec extends SparkSpec {

  import spark.implicits._

  test("lengthBiasReport: exact ppm cells, negative deltas, identical pairs") {
    val pairs = Seq(
      ("a", 1L, "one two three", "one two"), //  chosen longer (+1)
      ("a", 2L, "one two", "one two three four"), // rejected longer (-2)
      ("a", 3L, "same text here", "same text here"), // identical (0)
      ("b", 4L, "xx yy zz ww", "xx")) // +3
      .toDF("source", "pair_id", "chosen", "rejected")
    val r = Preference.lengthBiasReport(pairs, "source", "chosen", "rejected")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // (n_pairs, chosen_longer_ppm, len_delta_sum, identical_ppm)
    assert(r("a") == ((3L, 333333L, -1L, 333333L)), r("a").toString)
    assert(r("b") == ((1L, 1000000L, 3L, 0L)))
  }

  test("duplicateResponses: content-addressed groups at minPairs") {
    val pairs = Seq(
      (1L, "the shared answer"), (2L, "the shared answer"),
      (3L, "the shared answer"), (4L, "a unique answer"),
      (5L, "another unique one"))
      .toDF("pair_id", "chosen")
    val groups = Preference.duplicateResponses(pairs, "pair_id", "chosen").collect()
    assert(groups.length == 1)
    assert(groups.head.getLong(1) == 3L && groups.head.getLong(2) == 1L)
    val none = Preference.duplicateResponses(pairs, "pair_id", "chosen", minPairs = 4L)
    assert(none.count() == 0)
  }

  test("buildPairs: best-vs-rest, deterministic tie-break, no tie pairs, content-dedup") {
    val responses = Seq(
      // prompt 1: scores 9 (id 2), 9 (id 3 — tie, loses on id), 5, 5
      (1L, 2, "nine a", 9L), (1L, 3, "nine b", 9L),
      (1L, 1, "five a", 5L), (1L, 4, "five b", 5L),
      // prompt 2: the best and one loser share IDENTICAL text
      (2L, 1, "same words", 7L), (2L, 2, "same words", 3L),
      (2L, 3, "other words", 1L))
      .toDF("prompt_id", "resp_id", "resp", "sc")
    val got = Preference.buildPairs(responses, "prompt_id", "resp_id", "resp", "sc")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(5)))
      .sortBy(x => (x._1, x._3)).toSeq
    // prompt 1: chosen = id 2 (tie-break), pairs vs 1 and 4 only (the 9-9
    // tie never pairs); prompt 2: the identical-text pair (1,2) drops,
    // only (1,3) survives
    assert(got == Seq((1L, 2, 1, 4L), (1L, 2, 4, 4L), (2L, 1, 3, 6L)))
    val all = Preference.buildPairs(responses, "prompt_id", "resp_id", "resp", "sc",
        bestVsRest = false)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(x => (x._1, x._2, x._3)).toSeq
    // all ordered pairs with positive margin minus the content-identical
    // (2: 1>2) pair; 9-9 and 5-5 ties never pair
    assert(all == Seq(
      (1L, 2, 1), (1L, 2, 4), (1L, 3, 1), (1L, 3, 4),
      (2L, 1, 3), (2L, 2, 3)))
  }
}
