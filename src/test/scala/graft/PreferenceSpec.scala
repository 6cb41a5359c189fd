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
}
