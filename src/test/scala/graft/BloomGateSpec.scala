package graft

import graft.ingest.BloomGate

/** Bloom prefilter: no false negatives, exact two-phase equivalence,
  * bounded false-positive routing.
  */
class BloomGateSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives: every true duplicate routes to the exact phase") {
    val corpus = (1L to 1000L).map(i => (i, s"doc$i")).toDF("id", "content")
    val bloom = BloomGate.build(corpus, "id", expectedItems = 1000L)
    val batch = (900L to 1100L).map(i => (i, s"new$i")).toDF("id", "content")
    val (definitelyNew, possibly) = BloomGate.split(batch, "id", bloom)
    val newIds = definitelyNew.select("id").collect().map(_.getLong(0)).toSet
    // ids 900-1000 ARE in the corpus — none may be called definitely-new
    assert(newIds.intersect((900L to 1000L).toSet).isEmpty)
    assert(possibly.count() >= 101)
  }

  test("two-phase notExisting equals the plain anti-join") {
    val corpus = (1L to 500L).map(i => (i, s"doc$i")).toDF("id", "content")
    val batch = (400L to 700L).map(i => (i, s"b$i")).toDF("id", "content")
    val bloom = BloomGate.build(corpus, "id", 500L)
    val twoPhase = BloomGate.notExisting(corpus, batch, "id", bloom)
      .select("id").collect().map(_.getLong(0)).toSet
    val exact = batch.join(corpus.select("id"), Seq("id"), "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(twoPhase == exact)
    assert(twoPhase == (501L to 700L).toSet)
  }

  test("null id routes to the exact phase instead of failing the batch") {
    val corpus = (1L to 100L).map(i => (s"d$i", "x")).toDF("id", "content")
    val bloom = BloomGate.build(corpus, "id", 100L)
    val batch = Seq((null.asInstanceOf[String], "orphan"), ("d5", "dup"), ("z9", "new"))
      .toDF("id", "content")
    val (definitelyNew, possibly) = BloomGate.split(batch, "id", bloom)
    assert(definitelyNew.collect().map(_.getString(0)).toSeq == Seq("z9"))
    val p = possibly.collect().map(r => Option(r.getString(0))).toSet
    assert(p == Set(None, Some("d5")), "null + true dup both go to the exact join")
  }

  test("false positives stay near the configured rate") {
    val corpus = (1L to 10000L).map(i => (i, "x")).toDF("id", "content")
    val bloom = BloomGate.build(corpus, "id", 10000L, fpp = 0.01)
    val batch = (20000L to 30000L).map(i => (i, "y")).toDF("id", "content")
    val (_, possibly) = BloomGate.split(batch, "id", bloom)
    // all 10001 batch ids are absent; possibly = false positives only
    assert(possibly.count() <= 10001 * 0.05, s"fpp blew up: ${possibly.count()}")
  }
}
