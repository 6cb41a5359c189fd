package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Late-interaction multi-vector retrieval — the ColBERT-family `maxsim`
  * operator (Khattab & Zaharia 2020, arXiv:2004.12832), the one modern
  * retrieval scorer the single-vector semantic/hybrid family can't
  * express: documents keep ONE vector PER CHUNK/TOKEN (the
  * `q_chunk_embed_pool` layout without the pooling), queries arrive as a
  * SET of token vectors, and
  *
  *   score(q, d) = Σ_{t ∈ q} max_{c ∈ chunks(d)} ⟨t, c⟩
  *
  * — each query token matches its best chunk independently, so a
  * multi-topic document scores on all topics where a pooled single
  * vector averages them away.
  *
  * Dataflow: one join (chunk rows × query tokens), then TWO keyed
  * aggregates — max per (query, token, doc), sum per (query, doc) — and
  * a bounded top-k window. Both aggregates combiner-collapse map-side.
  * The 100 TB path is `candidates`: serve the shortlist from any
  * single-vector ANN route (IVF/graph — corpus-pruned), then maxsim
  * rescores ONLY the shortlisted documents' chunk rows — the join keys
  * on doc_id against the id-bucketed chunk table, a bucket-pruned point
  * fetch exactly like the graph rescore. Without candidates the scan is
  * corpus-sized (the exact-truth form the oracle replays).
  *
  * Scoring is exact when vectors are integer-quantized (the engine's
  * cent-unit convention): products stay < 2^53, so the double fold is
  * integer-exact and the whole operator replays hash-identically in SQL.
  */
object MaxSim {

  /** Top-k documents per query under maxsim.
    *
    * @param chunkVecs   (doc_id, vec) — one row per chunk/token vector
    * @param queryTokens (query_idx, tok_idx, vec) — one row per query
    *                    token; tok_idx only disambiguates repeated tokens
    *                    (a query with the same token twice scores it twice)
    * @param k           documents returned per query
    * @param candidates  optional (query_idx, doc_id) shortlist — the
    *                    ANN-pruned serving path; when absent, every
    *                    query scores every document (exact truth)
    * @param broadcastRowLimit the [[graft.ann.GraphSearch]] size gate
    *                    applied to the query-token frame: when its
    *                    statically-known row bound (local/limited plans
    *                    report one via `maxRows`) fits, it broadcasts;
    *                    when it overflows — or is unknowable, the safe
    *                    assumption for a corpus-derived token frame —
    *                    the join takes the shuffle-hash path instead.
    *                    Results are identical either way (MaxSimSpec).
    * @return (query_idx, doc_id, score) — score desc, doc_id asc
    */
  def topK(
      chunkVecs: DataFrame,
      queryTokens: DataFrame,
      k: Int,
      candidates: Option[DataFrame] = None,
      broadcastRowLimit: Long = graft.ann.GraphSearch.DefaultBroadcastRowLimit): DataFrame = {
    val chunks = chunkVecs.select(col("doc_id"), col("vec").as("cv"))
    val toks = queryTokens.select(
      col("query_idx"), col("tok_idx").as("__tok"), col("vec").as("qv"))
    val underLimit = queryTokens.queryExecution.optimizedPlan.maxRows
      .exists(_ <= broadcastRowLimit)
    val paired = candidates match {
      case Some(cand) =>
        // shortlist path: chunk fetch keyed on doc_id (bucket-pruned on
        // an id-partitioned chunk table), tokens keyed on query_idx
        cand.select("query_idx", "doc_id")
          .join(chunks, "doc_id")
          .join(graft.ann.GraphSearch.mkMark(underLimit)(toks), "query_idx")
      case None =>
        // the exact-truth scan is inherently chunks x tokens; a keyed
        // hint has no meaning on a cross join, so past the gate the
        // planner's partitioned cartesian takes over unforced
        chunks.crossJoin(if (underLimit) broadcast(toks) else toks)
    }
    val perTok = paired
      .withColumn("dp", VectorFunctions.dot(col("cv"), col("qv")))
      .groupBy("query_idx", "__tok", "doc_id")
      .agg(max(col("dp")).as("best"))
    val byQuery = Window.partitionBy("query_idx")
      .orderBy(col("score").desc, col("doc_id").asc)
    perTok
      .groupBy("query_idx", "doc_id")
      // tok_idx-ordered fold, not sum(): double addition is order-
      // sensitive at the ULP, and aggregation row order varies with the
      // plan shape (full scan vs shortlist join) — folding in token order
      // makes the score bit-reproducible on every serving path. The list
      // is query-token-bounded (<= maxQueryTokens rows per doc), so the
      // partial aggregate stays as combiner-friendly as the plain sum.
      .agg(aggregate(
        sort_array(collect_list(struct(col("__tok"), col("best")))),
        lit(0.0), (acc, x) => acc + x.getField("best")).as("score"))
      .withColumn("rn", row_number().over(byQuery))
      .filter(col("rn") <= k)
      .select("query_idx", "doc_id", "score")
  }
}
