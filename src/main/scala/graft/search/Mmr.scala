package graft.search

import org.apache.spark.sql.DataFrame

/** Maximal marginal relevance (Carbonell & Goldstein 1998) — diversity
  * re-ranking of a search shortlist: greedily pick the candidate
  * maximizing λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s), so near-duplicate
  * hits stop crowding the result page. The standard RAG serving step
  * between top-k retrieval and context assembly.
  *
  * Scale shape: MMR is inherently sequential in k, but its input is the
  * SERVING SHORTLIST — bounded by the n_results guard (≤ 1000), never
  * the corpus — so the greedy loop runs driver-side on an output-sized
  * set (same adjudication as the cluster union-find). The expensive part
  * (producing the shortlist) stays fully distributed in
  * [[Semantic]]/[[graft.ann.Ann]].
  *
  * Determinism: penalty term is a max (order-independent); the combine
  * uses doubles with fixed association (λ·rel − (1−λ)·maxSim, empty-set
  * penalty 0); ties break to the lower id. Pairwise cosine mirrors
  * [[graft.functions.VectorFunctions]] exactly (index-order dot,
  * separately rooted norms), so the whole re-rank replays in DuckDB.
  */
object Mmr {

  /** Re-rank a bounded shortlist: input (id, score, embedding) rows,
    * output (rank, id, score, mmr) — rank 1..k in selection order.
    */
  def rerank(shortlist: DataFrame, k: Int, lambda: Double = 0.5): DataFrame = {
    require(k >= 1, s"need k >= 1 (got $k)")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda $lambda outside [0,1]")
    val spark = shortlist.sparkSession
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    // id stays type-generic like the surrounding serving operators: no
    // long cast (non-numeric ids would null out and corrupt the re-rank);
    // tie-break compares numerics numerically, everything else lexically
    val idField = shortlist.schema("id")
    // serving-bounded collect: the shortlist IS the output-sized set
    val cand = shortlist
      .select(col("id"), col("score").cast("double"), col("embedding"))
      .collect()
      .map(r => (r.get(0), r.getDouble(1), r.getSeq[Float](2).toArray))
    def idLt(x: Any, y: Any): Boolean = (x, y) match {
      case (a: Number, b: Number) => a.doubleValue < b.doubleValue
      case (a, b) => String.valueOf(a) < String.valueOf(b)
    }
    val norms = cand.map { case (_, _, e) =>
      var s = 0.0; var d = 0
      while (d < e.length) { s += e(d).toDouble * e(d).toDouble; d += 1 }
      math.sqrt(s)
    }
    def cos(i: Int, j: Int): Double = {
      val a = cand(i)._3; val b = cand(j)._3
      var s = 0.0; var d = 0
      while (d < a.length) { s += a(d).toDouble * b(d).toDouble; d += 1 }
      s / (norms(i) * norms(j))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val remaining = scala.collection.mutable.LinkedHashSet(cand.indices: _*)
    while (selected.size < math.min(k, cand.length)) {
      val best = remaining.iterator.map { i =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => cos(i, s._1)).max
        (i, lambda * cand(i)._2 - (1 - lambda) * maxSim)
      }.reduceLeft { (x, y) =>
        if (y._2 > x._2 || (y._2 == x._2 && idLt(cand(y._1)._1, cand(x._1)._1))) y
        else x
      }
      selected += best
      remaining -= best._1
    }
    val outSchema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("id", idField.dataType, idField.nullable),
      StructField("score", DoubleType, nullable = false),
      StructField("mmr", DoubleType, nullable = false)))
    val rows = selected.toSeq.zipWithIndex.map { case ((i, m), r) =>
      org.apache.spark.sql.Row(r + 1, cand(i)._1, cand(i)._2, m)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), outSchema)
  }
}
