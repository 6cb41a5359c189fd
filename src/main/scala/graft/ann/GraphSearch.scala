package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Graph-guided ANN serving: greedy beam search over a precomputed kNN
  * graph — the HNSW/DiskANN-family query shape (Malkov & Yashunin 2018,
  * arXiv:1603.09320; Subramanya et al. 2019 DiskANN), expressed as a fixed
  * number of join rounds instead of a pointer-chasing in-memory walk.
  *
  * Serving state is two tables the engine already maintains:
  *   - the adjacency list (qid -> its k graph neighbors), built offline by
  *     [[Ann.knnJoin]] / [[NnDescent]] and stored id-hash-bucketed like the
  *     documents table, so a frontier probe is a bucket-pruned point
  *     lookup, never an adjacency scan;
  *   - the vectors table (id, embedding, norm) for exact re-scoring.
  *
  * Query shape per hop: the frontier (Q queries x B beam rows) joins the
  * adjacency table to collect neighbor ids, unions the current beam,
  * dedupes, exact-scores against the query vectors, and keeps the top B
  * per query. After H hops the top k of the final beam is the answer.
  * Total work is O(Q * B * k * H) adjacency rows + point vector fetches —
  * independent of corpus size, which is the entire point: at 100 TB the
  * scan-everything brute path is off the table, and this path touches a
  * few hundred bucket-pruned rows per query.
  *
  * JOIN-SIDE SIZING — the Q axis: every query-derived frame (the query
  * vectors, the frontier, the visited set) is KB-sized at interactive Q
  * and belongs on the broadcast side of its join against the corpus-sized
  * vectors/adjacency tables. But the frames grow linearly in Q, and at
  * batched-serving Q (10^4-10^5 queries) a forced broadcast of the
  * O(Q*B*k*H) visited set is a driver/executor OOM. All entry points
  * therefore take a `broadcastRowLimit`: when the analytic candidate
  * bound Q*B*max(H,1)*k fits, the plan broadcasts exactly as before; when
  * it overflows, NO frame is broadcast — the query-derived side carries a
  * shuffle-hash hint instead, so every rescore/expand join becomes a
  * hash join partitioned on its key (id / query_idx), the plan a 1000-
  * executor cluster wants at high Q. Both paths compute the identical
  * frame (AnnServeSpec asserts equality; QSweep measures the crossover).
  *
  * Determinism: scores recompute identically on both engines (double
  * cosine); beam membership ties break on id, so the search replays
  * exactly in the SQL oracle with the hops unrolled as CTEs.
  */
object GraphSearch {

  /** Default cap on the analytic query-side candidate bound
    * (Q*beam*max(hops,1)*k) before serving abandons forced broadcasts
    * for shuffle-hash joins. 500k candidate rows of (query_idx, id,
    * score) is ~10-15 MB serialized — the order of Spark's default
    * autoBroadcastJoinThreshold.
    */
  val DefaultBroadcastRowLimit: Long = 500000L

  /** Candidate-frame bound that drives the broadcast/shuffle decision. */
  private def candidateBound(q: Int, beam: Int, hops: Int, k: Int): Long =
    q.toLong * beam * math.max(hops, 1) * k

  /** Mark a query-derived frame for its join against a corpus-sized
    * table: broadcast under the limit, shuffle-hash build side above it.
    * Shared by every serving route (Ann.ivfTopKBatch, MaxSim) so the
    * gate semantics — and the AnnServeSpec parity contract — stay one
    * definition.
    */
  private[graft] def mkMark(underLimit: Boolean): DataFrame => DataFrame =
    if (underLimit) broadcast else _.hint("shuffle_hash")

  /** Beam search over `graph` (qid, neighbor) for each query vector.
    *
    * @param graph   adjacency pairs (qid, neighbor) — k rows per id
    * @param vectors (id, embedding, norm)
    * @param queries (query_idx, query vector) pairs
    * @param entries number of deterministic entry points (smallest ids;
    *                a production index stores per-cluster medoids instead —
    *                same contract, one row per cluster)
    * @param beam    beam width B
    * @param hops    number of expansion rounds H
    * @param k       results per query (k <= beam)
    * @param broadcastRowLimit candidate-bound gate (see scaladoc above);
    *                pass 0 to force the shuffle path, Long.MaxValue to
    *                force broadcasts
    */
  def beamSearch(
      graph: DataFrame,
      vectors: DataFrame,
      queries: Seq[(Int, Seq[Float])],
      entries: Int,
      beam: Int,
      hops: Int,
      k: Int,
      broadcastRowLimit: Long = DefaultBroadcastRowLimit): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val mark = mkMark(candidateBound(queries.size, beam, hops, k) <= broadcastRowLimit)
    val qdf = queryFrame(spark, queries, mark)
    // Deterministic entry points: the E smallest ids (TakeOrdered — no
    // corpus sort). A persisted index would store cluster medoids here.
    val entryIds = vectors.select("id").orderBy("id").limit(entries)
    beamSearchFrom(graph, vectors, qdf,
      qdf.select("query_idx").crossJoin(entryIds), beam, hops, k, mark)
  }

  /** Beam search from CALLER-SUPPLIED per-query entry points
    * (query_idx, id) — the IVF-coarse composition: route the query to its
    * nprobe nearest cluster representatives first, then walk the graph
    * from there (a two-layer HNSW's shape with the IVF quantizer as the
    * upper layer).
    */
  def beamSearchWithEntries(
      graph: DataFrame,
      vectors: DataFrame,
      queries: Seq[(Int, Seq[Float])],
      entryPoints: DataFrame, // (query_idx, id)
      beam: Int,
      hops: Int,
      k: Int,
      broadcastRowLimit: Long = DefaultBroadcastRowLimit): DataFrame = {
    val spark = vectors.sparkSession
    val mark = mkMark(candidateBound(queries.size, beam, hops, k) <= broadcastRowLimit)
    beamSearchFrom(graph, vectors, queryFrame(spark, queries, mark),
      entryPoints, beam, hops, k, mark)
  }

  /** Route each query to its top-`entries` candidates among
    * `entryCandidates` (an (id) frame — typically the persisted medoid
    * table): exact cosine over candidate-count rows per query. The
    * candidate set is a small constant (cluster count), so it is ALWAYS
    * broadcast; the query frame follows the Q gate. Returns
    * (query_idx, id) for [[beamSearchWithEntries]].
    */
  def routeEntries(
      vectors: DataFrame,
      entryCandidates: DataFrame,
      queries: Seq[(Int, Seq[Float])],
      entries: Int,
      broadcastRowLimit: Long = DefaultBroadcastRowLimit): DataFrame = {
    val spark = vectors.sparkSession
    val mark = mkMark(queries.size.toLong * entries <= broadcastRowLimit)
    val qdf = queryFrame(spark, queries, mark)
    val cands = broadcast(
      vectors.join(broadcast(entryCandidates), Seq("id"), "left_semi")
        .select(col("id"), col("embedding"), col("norm")))
    val byQ = Window.partitionBy("query_idx")
      .orderBy(col("sc").desc, col("id").asc)
    qdf.crossJoin(cands)
      .withColumn("sc",
        VectorFunctions.dot(col("qv"), col("embedding")) / (col("qn") * col("norm")))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= entries)
      .select("query_idx", "id")
  }

  /** Filtered ANN on the graph route: beam-walk UNFILTERED, answer from
    * the visited set ∩ predicate.
    *
    * Filtering the traversal itself would disconnect the graph exactly
    * when the predicate is selective (a matching island may only be
    * reachable through non-matching nodes), and post-filtering the final
    * k-row beam loses recall whenever selectivity < k/beam (the
    * MongoDB-backend oversampling workaround the reference inherits —
    * mongodb.py:277's numCandidates = max(10·k, 100) constant). Instead,
    * the walk keeps its exact unfiltered frontier (connectivity intact)
    * while EVERY node it ever visits — entries, expansions, rejected
    * beam overflow — stays a candidate; the answer is the exact-scored
    * top-k among visited ∧ pred. The visited set is O(Q·B·k·hops) rows
    * (a built-in oversample of hops·beam/k ≥ the mongo constant at the
    * defaults), so the final filtered rescore is a candidate-bounded join
    * (broadcast under the Q gate, shuffle-hash above it), and the
    * predicate reaches the vectors scan as an ordinary pushed filter.
    * Recall is graded against exact FILTERED truth in
    * `q_ann_graph_filtered` on selective and non-selective predicates.
    */
  def beamSearchFiltered(
      graph: DataFrame,
      vectors: DataFrame,
      queries: Seq[(Int, Seq[Float])],
      entries: Int,
      beam: Int,
      hops: Int,
      k: Int,
      pred: Column,
      broadcastRowLimit: Long = DefaultBroadcastRowLimit): DataFrame = {
    val spark = vectors.sparkSession
    val mark = mkMark(candidateBound(queries.size, beam, hops, k) <= broadcastRowLimit)
    val qdf = queryFrame(spark, queries, mark)
    val entryIds = vectors.select("id").orderBy("id").limit(entries)
    beamSearchFilteredFrom(graph, vectors, qdf,
      qdf.select("query_idx").crossJoin(entryIds), beam, hops, k, pred, mark)
  }

  /** [[beamSearchFiltered]] from CALLER-SUPPLIED per-query entry points
    * (query_idx, id) — the medoid/IVF routing composition, filtered. The
    * walk itself stays unfiltered (see [[beamSearchFiltered]]); only the
    * final visited-set rescore applies `pred`.
    */
  def beamSearchFilteredWithEntries(
      graph: DataFrame,
      vectors: DataFrame,
      queries: Seq[(Int, Seq[Float])],
      entryPoints: DataFrame, // (query_idx, id)
      beam: Int,
      hops: Int,
      k: Int,
      pred: Column,
      broadcastRowLimit: Long = DefaultBroadcastRowLimit): DataFrame = {
    val spark = vectors.sparkSession
    val mark = mkMark(candidateBound(queries.size, beam, hops, k) <= broadcastRowLimit)
    beamSearchFilteredFrom(graph, vectors, queryFrame(spark, queries, mark),
      entryPoints, beam, hops, k, pred, mark)
  }

  /** [[visitedFrom]] with the public entry-point signature — the walk of
    * [[beamSearchFilteredWithEntries]] WITHOUT its final rescore, for
    * callers grading several predicates against one unfiltered walk.
    */
  def visitedWithEntries(
      graph: DataFrame,
      vectors: DataFrame,
      queries: Seq[(Int, Seq[Float])],
      entryPoints: DataFrame, // (query_idx, id)
      beam: Int,
      hops: Int,
      k: Int,
      broadcastRowLimit: Long = DefaultBroadcastRowLimit): DataFrame = {
    val spark = vectors.sparkSession
    val mark = mkMark(candidateBound(queries.size, beam, hops, k) <= broadcastRowLimit)
    visitedFrom(graph, vectors, queryFrame(spark, queries, mark),
      entryPoints, beam, hops, mark)
  }

  /** [[filteredRescore]] with the public entry-point signature: top-k
    * among a materialized visited set ∧ `pred` —
    * `beamSearchFilteredWithEntries(...) ==
    *  filteredRescoreTopK(visitedWithEntries(...), ...)`.
    */
  def filteredRescoreTopK(
      visited: DataFrame, // (query_idx, id)
      vectors: DataFrame,
      queries: Seq[(Int, Seq[Float])],
      k: Int,
      pred: Column,
      beam: Int,
      hops: Int,
      broadcastRowLimit: Long = DefaultBroadcastRowLimit): DataFrame = {
    val spark = vectors.sparkSession
    val mark = mkMark(candidateBound(queries.size, beam, hops, k) <= broadcastRowLimit)
    filteredRescore(visited, vectors, queryFrame(spark, queries, mark),
      k, pred, mark)
  }

  private def beamSearchFilteredFrom(
      graph: DataFrame,
      vectors: DataFrame,
      qdf: DataFrame,
      entryPoints: DataFrame,
      beam: Int,
      hops: Int,
      k: Int,
      pred: Column,
      mark: DataFrame => DataFrame): DataFrame =
    filteredRescore(
      visitedFrom(graph, vectors, qdf, entryPoints, beam, hops, mark),
      vectors, qdf, k, pred, mark)

  /** The walk's VISITED set (query_idx, id) — entries plus every node any
    * hop ever expanded to. Candidate-bounded: O(Q·B·k·hops) rows. Exposed
    * so a caller grading SEVERAL predicates against the same unfiltered
    * walk (q_ann_graph_filtered's shape) can materialize the walk once
    * and pay only the per-predicate final rescore.
    */
  private[graft] def visitedFrom(
      graph: DataFrame,
      vectors: DataFrame,
      qdf: DataFrame,
      entryPoints: DataFrame,
      beam: Int,
      hops: Int,
      mark: DataFrame => DataFrame): DataFrame = {
    val byQuery = Window.partitionBy("query_idx")
      .orderBy(col("score").desc, col("id").asc)
    def rescore(cands: DataFrame, keep: Int): DataFrame =
      mark(cands).join(vectors, "id")
        .join(qdf, "query_idx")
        .withColumn("score",
          VectorFunctions.dot(col("qv"), col("embedding")) / (col("qn") * col("norm")))
        .withColumn("rn", row_number().over(byQuery))
        .filter(col("rn") <= keep)
        .select("query_idx", "id", "score")

    var frontier = rescore(entryPoints.select("query_idx", "id"), beam)
    var visited = entryPoints.select("query_idx", "id")
    for (_ <- 1 to hops) {
      // materialize the hop's expansion ONCE: it feeds BOTH the visited
      // union and the next frontier's rescore — left lazy, each hop's
      // whole walk-so-far re-executes per consumer (2^hops subtree
      // growth). The frame is candidate-bounded (Q·B·k rows), the same
      // size class the serving answer itself has.
      val expanded = mark(frontier.select(col("query_idx"), col("id").as("qid")))
        .join(graph, "qid")
        .select(col("query_idx"), col("neighbor").as("id"))
        .union(frontier.select("query_idx", "id"))
        .distinct()
        .localCheckpoint()
      visited = visited.union(expanded)
      frontier = rescore(expanded, beam)
    }
    visited.distinct()
  }

  /** Exact top-k among `visited` ∧ `pred` — [[beamSearchFiltered]]'s final
    * stage; the predicate prunes the vectors side of the rescore join.
    */
  private[graft] def filteredRescore(
      visited: DataFrame, // (query_idx, id)
      vectors: DataFrame,
      qdf: DataFrame,
      k: Int,
      pred: Column,
      mark: DataFrame => DataFrame): DataFrame = {
    val byQuery = Window.partitionBy("query_idx")
      .orderBy(col("score").desc, col("id").asc)
    mark(visited).join(vectors.filter(pred), "id")
      .join(qdf, "query_idx")
      .withColumn("score",
        VectorFunctions.dot(col("qv"), col("embedding")) / (col("qn") * col("norm")))
      .withColumn("rn", row_number().over(byQuery))
      .filter(col("rn") <= k)
      .select("query_idx", "id", "score")
  }

  private[ann] def queryFrame(
      spark: SparkSession, queries: Seq[(Int, Seq[Float])],
      mark: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    mark(
      queries.toDF("query_idx", "qv")
        .withColumn("qv", col("qv").cast("array<double>"))
        .withColumn("qn", VectorFunctions.l2Norm(col("qv"))))
  }

  private def beamSearchFrom(
      graph: DataFrame,
      vectors: DataFrame,
      qdf: DataFrame,
      entryPoints: DataFrame,
      beam: Int,
      hops: Int,
      k: Int,
      mark: DataFrame => DataFrame): DataFrame = {
    require(k <= beam, s"k=$k must be <= beam=$beam")

    val byQuery = Window.partitionBy("query_idx")
      .orderBy(col("score").desc, col("id").asc)

    // Exact-score a (query_idx, id) candidate set and keep the top B.
    // The candidate set is always O(Q * B * k) rows — the query side of
    // the point-fetch join against the corpus-sized vectors table.
    def rescore(cands: DataFrame): DataFrame =
      mark(cands).join(vectors, "id")
        .join(qdf, "query_idx")
        .withColumn("score",
          VectorFunctions.dot(col("qv"), col("embedding")) / (col("qn") * col("norm")))
        .withColumn("rn", row_number().over(byQuery))
        .filter(col("rn") <= beam)
        .select("query_idx", "id", "score")

    var frontier = rescore(entryPoints.select("query_idx", "id"))

    for (_ <- 1 to hops) {
      // neighbors of the beam; the frontier is Q*B rows — query side
      val expanded = mark(frontier.select(col("query_idx"), col("id").as("qid")))
        .join(graph, "qid")
        .select(col("query_idx"), col("neighbor").as("id"))
        .union(frontier.select("query_idx", "id"))
        .distinct()
      frontier = rescore(expanded)
    }

    frontier
      .withColumn("rn", row_number().over(byQuery))
      .filter(col("rn") <= k)
      .select("query_idx", "id", "score")
  }
}
