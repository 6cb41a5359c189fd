package graft

import org.apache.spark.sql.functions._
import graft.operators.Split
import graft.retriever.Retriever

/** Overlapping chunking window math and leakage-safe split invariants. */
class ChunkSplitSpec extends SparkSpec {

  import spark.implicits._

  test("chunkOverlap windows: starts at stride steps, last reaches the end, none contained") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("id", "content")
    val out = Retriever.chunkOverlap(docs, chunkSize = 8, stride = 4)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[String]("content")))
    // n=10, size=8, stride=4 -> 1 + ceil(2/4) = 2 windows: [w1..w8], [w5..w10]
    assert(out.toSeq == Seq(
      (0, (1 to 8).map(i => s"w$i").mkString(" ")),
      (1, (5 to 10).map(i => s"w$i").mkString(" "))))
  }

  test("chunkOverlap passes short documents through as one window") {
    val docs = Seq((1L, "just three words")).toDF("id", "content")
    val out = Retriever.chunkOverlap(docs, 20, 12).collect()
    assert(out.length == 1 && out(0).getAs[String]("content") == "just three words")
  }

  test("chunkOverlap with stride == size equals the non-overlapping chunker") {
    val docs = Seq((1L, (1 to 50).map(i => s"t$i").mkString(" ")))
      .toDF("id", "content")
    val a = Retriever.chunkOverlap(docs, 20, 20)
      .select("content").collect().map(_.getString(0)).sorted.toSeq
    val b = Retriever.chunk(docs, 20)
      .select("content").collect().map(_.getString(0)).sorted.toSeq
    assert(a == b)
  }

  test("leakage-safe split never puts a near-dup pair across the split") {
    val docs = (1L to 50L).map(i => (i, s"doc $i")).toDF("id", "content")
    // chain 1-2-3 plus pair 10-11; everything else isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Split.leakageSafeSplit(docs, pairs, evalPermille = 300)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L), "cluster 1-2-3 must not straddle")
    assert(out(10L) == out(11L))
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "eval")))
    // isolated docs split by their own id hash; both sides populated at 30%
    val sides = out.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sides.getOrElse("eval", 0) > 0 && sides.getOrElse("train", 0) > 0)
  }

  test("fixedSize sampling is exact-size, partitioning-invariant, growth-stable") {
    import graft.operators.Sampling
    val docs = (1L to 300L).map(i => (i, s"d$i")).toDF("id", "payload")
    def ids(d: org.apache.spark.sql.DataFrame) = Sampling.fixedSize(d, "id", 40)
      .select("id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    assert(a.size == 40)
    assert(a == ids(docs.repartition(17)))
    // growth stability: adding rows can only REPLACE members whose hash
    // exceeds a newcomer's — the survivors stay
    val grown = (1L to 400L).map(i => (i, s"d$i")).toDF("id", "payload")
    val b = ids(grown)
    assert((a intersect b).size >= 25, "hash-prefix stability violated")
    // per-group: exactly k per group
    val g = docs.withColumn("g", (org.apache.spark.sql.functions.col("id") % 3).cast("string"))
    val perG = Sampling.fixedSizePerGroup(g, "id", "g", 7)
      .groupBy("g").count().collect().map(_.getLong(1))
    assert(perG.forall(_ == 7L))
  }

  test("weighted sampling: exact-size, deterministic, weight-proportional") {
    import graft.operators.Sampling
    // 200 light rows (w=1) + 20 heavy rows (w=10000): heavies should
    // dominate a k=20 draw (ln-weight gap ~9.2 vs Gumbel noise)
    val docs = ((1L to 200L).map(i => (i, 1L)) ++
      (1001L to 1020L).map(i => (i, 10000L))).toDF("id", "w")
    def draw(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedFixedSize(d, "id", "w", 20)
        .select("id").collect().map(_.getLong(0)).toSet
    val a = draw(docs)
    assert(a.size == 20)
    assert(a == draw(docs.repartition(13)), "not partitioning-invariant")
    assert(a.count(_ >= 1001L) >= 18, s"heavy rows under-drawn: $a")
    // zero/negative/null weights are excluded outright
    val withBad = docs.unionByName(
      Seq((5000L, 0L), (5001L, -3L)).toDF("id", "w"))
    assert(!draw(withBad).exists(_ >= 5000L))
    // per-group carve: exactly k per group, same determinism
    val g = docs.withColumn("g",
      (org.apache.spark.sql.functions.col("id") % 2).cast("string"))
    val perG = Sampling.weightedFixedSizePerGroup(g, "id", "w", "g", 5)
    assert(perG.groupBy("g").count().collect().map(_.getLong(1)).forall(_ == 5L))
    val p1 = perG.select("id").collect().map(_.getLong(0)).toSet
    val p2 = Sampling.weightedFixedSizePerGroup(g.repartition(7), "id", "w", "g", 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(p1 == p2)
  }
}
