package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ann.{Ann, GraphSearch}

/** High-Q serving gate: every ANN serving route must return the
  * IDENTICAL frame whether its query-derived frames ride the broadcast
  * path (interactive Q) or the shuffle-hash path (batched-serving Q
  * past `broadcastRowLimit`) — the size gate changes join strategy,
  * never results. Also pins the batched IVF route (one plan for the
  * whole query batch) to the per-query driver loop it replaces.
  */
class AnnServeSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  /** Deterministic synthetic vectors: hash-derived, nonzero norm. */
  private lazy val vectors: DataFrame = {
    val rows = (0L until 200L).map { id =>
      val v = (0 until Dim).map { d =>
        val h = (id * 1000003L + d * 7919L) % 199L
        (h.toFloat - 99f) / 100f + (if (d == 0) 1.5f else 0f)
      }
      (id, v)
    }
    rows.toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("norm",
        graft.functions.VectorFunctions.l2Norm(col("embedding")))
      .localCheckpoint()
  }

  private lazy val graph: DataFrame =
    Ann.knnJoin(vectors, 4).select("qid", "neighbor").localCheckpoint()

  private lazy val queries: Seq[(Int, Seq[Float])] =
    Seq(0, 1, 2, 3, 4).map { q =>
      q -> (0 until Dim).map { d =>
        val h = (q * 31L + d * 17L) % 101L
        (h.toFloat - 50f) / 60f + (if (d == 0) 1f else 0f)
      }
    }

  private def collected(df: DataFrame): Seq[(Int, Long, Double)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq

  test("graph beam search: shuffle path returns the identical frame") {
    val bcast = GraphSearch.beamSearch(graph, vectors, queries,
      entries = 3, beam = 6, hops = 3, k = 4, broadcastRowLimit = Long.MaxValue)
    val shuffled = GraphSearch.beamSearch(graph, vectors, queries,
      entries = 3, beam = 6, hops = 3, k = 4, broadcastRowLimit = 0L)
    val a = collected(bcast)
    assert(a.nonEmpty && a == collected(shuffled))
    // the gate really flips the physical join strategy
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(shuffled.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
  }

  test("filtered beam search: shuffle path returns the identical frame") {
    val pred = pmod(col("id"), lit(3)) === 0
    val bcast = GraphSearch.beamSearchFiltered(graph, vectors, queries,
      entries = 3, beam = 6, hops = 3, k = 4, pred,
      broadcastRowLimit = Long.MaxValue)
    val shuffled = GraphSearch.beamSearchFiltered(graph, vectors, queries,
      entries = 3, beam = 6, hops = 3, k = 4, pred, broadcastRowLimit = 0L)
    val a = collected(bcast)
    assert(a.nonEmpty && a == collected(shuffled))
    assert(a.forall(_._2 % 3 == 0))
  }

  test("routed entries + filtered walk: both gate paths agree") {
    val medoids = vectors.filter(pmod(col("id"), lit(20)) === 0).select("id")
    def run(limit: Long) = {
      val entries = GraphSearch.routeEntries(vectors, medoids, queries,
        entries = 2, broadcastRowLimit = limit)
      GraphSearch.beamSearchFilteredWithEntries(graph, vectors, queries,
        entries, beam = 6, hops = 2, k = 4, pred = col("id") < 150,
        broadcastRowLimit = limit)
    }
    val a = collected(run(Long.MaxValue))
    assert(a.nonEmpty && a == collected(run(0L)))
  }

  test("batched IVF equals the per-query loop on both gate paths") {
    val cents = Ann.kmeansCentroids(vectors, 8, 2).localCheckpoint()
    val assigned = Ann.assign(vectors, cents).localCheckpoint()
    val loop = collected(
      Ann.ivfTopK(assigned, cents, queries, k = 5, nprobe = 3))
    assert(loop.nonEmpty)
    val batchB = collected(Ann.ivfTopKBatch(assigned, cents, queries,
      k = 5, nprobe = 3, broadcastRowLimit = Long.MaxValue))
    val batchS = collected(Ann.ivfTopKBatch(assigned, cents, queries,
      k = 5, nprobe = 3, broadcastRowLimit = 0L))
    // bit-exact score parity: same sequential-fold double arithmetic
    assert(batchB == loop)
    assert(batchS == loop)
  }

  test("adaptive batched IVF equals the adaptive per-query loop on both gate paths") {
    val cents = Ann.kmeansCentroids(vectors, 8, 2).localCheckpoint()
    val assigned = Ann.assign(vectors, cents).localCheckpoint()
    val numCandidates = 60L // prunes: ~3 of 8 clusters per query
    val sizes = assigned.groupBy("cluster_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val centroidRows = cents
      .select("centroid_id", "centroid", "centroid_norm").collect()
    // the governed loop's exact per-query algebra (Api.approxHits)
    val loop = queries.map { case (qIdx, qVec) =>
      val qNorm = math.sqrt(qVec.map(v => v.toDouble * v.toDouble).sum)
      val ranked = centroidRows.map { r =>
        val c = r.getSeq[Float](1)
        val dot = c.zip(qVec).map { case (x, y) => x.toDouble * y.toDouble }.sum
        (1.0 - dot / (r.getDouble(2) * qNorm), r.getLong(0))
      }.sorted.toSeq
      val probes = graft.ann.IvfIndex.adaptiveProbes(ranked, sizes, numCandidates)
      assigned
        .filter(col("cluster_id").isin(probes: _*))
        .withColumn("score",
          graft.search.Semantic.scoreAgainst(col("embedding"), col("norm"), qVec))
        .withColumn("query_idx", lit(qIdx))
        .select("query_idx", "id", "score")
        .orderBy(col("score").desc, col("id").asc)
        .limit(5)
    }.reduce(_ unionAll _)
    val want = collected(loop)
    assert(want.nonEmpty)
    assert(collected(Ann.ivfTopKBatchAdaptive(assigned, cents, queries,
      k = 5, numCandidates, broadcastRowLimit = Long.MaxValue)) == want)
    assert(collected(Ann.ivfTopKBatchAdaptive(assigned, cents, queries,
      k = 5, numCandidates, broadcastRowLimit = 0L)) == want)
  }

  test("batched IVF: empty query batch keeps the result schema") {
    val cents = Ann.kmeansCentroids(vectors, 4, 1)
    val assigned = Ann.assign(vectors, cents)
    val out = Ann.ivfTopKBatch(assigned, cents, Nil, k = 5, nprobe = 2)
    assert(out.columns.toSeq == Seq("query_idx", "id", "score"))
    assert(out.count() == 0)
  }
}
