package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR semantics: smoothing covers the whole bucket space, weights rank
  * target-like documents above dissimilar ones, and selection is
  * partitioning-invariant.
  */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  private val B = 64

  private def toksDf(rows: Seq[(Long, Seq[String])]) =
    rows.toDF("id", "toks")

  test("importance table covers every bucket, smoothed") {
    val target = toksDf(Seq((1L, Seq("alpha", "beta"))))
    val raw = toksDf(Seq((1L, Seq("alpha", "beta")), (2L, Seq("gamma", "delta"))))
    val tab = Dsir.importanceTable(
      Dsir.bucketCounts(target, B), Dsir.bucketCounts(raw, B), B).collect()
    assert(tab.length == B)
    assert(tab.map(_.getLong(0)).toSet == (0L until B.toLong).toSet)
  }

  test("target-like documents outweigh dissimilar ones") {
    val target = toksDf((1L to 20L).map(i => (i, Seq("science", "method", "data"))))
    val raw = toksDf(Seq(
      (101L, Seq("science", "method", "data")),
      (102L, Seq("spam", "click", "win"))))
    val tab = Dsir.importanceTable(
      Dsir.bucketCounts(target, B), Dsir.bucketCounts(raw, B), B)
    val w = Dsir.importanceWeights(raw, tab, B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(101L) > w(102L),
      s"target-like doc ${w(101L)} must outweigh spam ${w(102L)}")
  }

  test("resampleTopK is partitioning-invariant and respects k") {
    val docs = toksDf((1L to 100L).map(i =>
      (i, Seq.fill((i % 5 + 1).toInt)(s"tok${i % 7}"))))
    val tab = Dsir.importanceTable(
      Dsir.bucketCounts(docs.limit(30), B), Dsir.bucketCounts(docs, B), B)
    def pick(d: org.apache.spark.sql.DataFrame) =
      Dsir.resampleTopK(Dsir.importanceWeights(d, tab, B), 10)
        .select("id").collect().map(_.getLong(0)).toSet
    val a = pick(docs)
    val b = pick(docs.repartition(17, col("id")))
    assert(a == b && a.size == 10)
  }
}
