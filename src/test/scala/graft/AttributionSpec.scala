package graft

import graft.search.Attribution

/** Answer attribution: argmax 3-gram containment with deterministic
  * ties, unattributable short sentences, exact coverage ppm.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val contexts = Seq(
    (1L, 10L, "the quick brown fox jumps over the lazy dog"),
    (1L, 20L, "pack my box with five dozen liquor jugs"),
    (1L, 30L, "the quick brown fox sleeps")).toDF("answer_id", "doc_id", "content")

  test("each sentence attributes to its max-containment doc, ties to min id") {
    val sentences = Seq(
      (1L, 0, "the quick brown fox jumps"),     // 3 grams, all in doc 10
      (1L, 1, "five dozen liquor jugs"),        // 2 grams, doc 20
      (1L, 2, "the quick brown fox"),           // 2 grams, in BOTH 10 and 30 -> tie -> 10
      (1L, 3, "completely unrelated words here"),
      (1L, 4, "so short")).toDF("answer_id", "sent_idx", "text")
    val got = Attribution.attribute(sentences, contexts)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got == Seq(
      (0, 10L, 3L, 3L, 1000000L),
      (1, 20L, 2L, 2L, 1000000L),
      (2, 10L, 2L, 2L, 1000000L), // tie between 10 and 30 -> smaller id
      (3, -1L, 0L, 2L, 0L),       // two grams, matched nowhere
      (4, -1L, 0L, 0L, 0L)))      // too short for any 3-gram
  }

  test("candidates never leak across answers") {
    val sentences = Seq((2L, 0, "the quick brown fox jumps"))
      .toDF("answer_id", "sent_idx", "text")
    // contexts are all under answer_id 1 -> answer 2 finds nothing
    val got = Attribution.attribute(sentences, contexts).collect().head
    assert(got.getLong(2) == -1L && got.getLong(3) == 0L)
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Attribution.attribute(
        Seq((1L, 0, "x")).toDF("answer_id", "sent_idx", "text"),
        contexts, n = 0)
    }
  }
}
