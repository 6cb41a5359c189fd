package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the simplest of the code-compression family
  * next to [[Pq]]: each embedding dimension is affinely mapped to a byte,
  * code_d = floor((v_d - min_d) * 255 / (max_d - min_d)) clamped to
  * [0, 255], using per-dimension corpus min/max. 4x smaller scans than
  * float32 with far better fidelity than PQ at the same simplicity —
  * the standard first step before IVF/PQ when recall matters (every major
  * vector store ships it as "SQ8"/"int8" compression).
  *
  * Serving uses the same ADC + re-rank shape as [[Pq.searchAdcRerank]]:
  * approximate scores come from codes only, and the dot against a
  * dequantized vector linearizes to a per-query weight vector —
  * q · decode(codes) = Σ_d q_d·min_d + Σ_d (q_d·scale_d/255)·code_d —
  * so scoring is one fused zip_with/aggregate over the codes column with
  * the constant term dropped (it shifts every score of a query equally
  * and cannot change ranks). The full-corpus scan never reads floats;
  * only the oversampled shortlist joins back for exact cosine.
  *
  * Determinism: training is min/max (no arithmetic), encoding and ADC
  * are fixed-order double expressions — all bit-reproducible and
  * DuckDB-replayable end to end.
  */
object Sq {

  /** Per-dimension quantization bounds. `scales` pre-computes
    * (max - min) in double — zero for constant dimensions (encoded 0).
    */
  final case class SqModel(mins: Array[Float], maxs: Array[Float]) {
    def dim: Int = mins.length
    lazy val scales: Array[Double] =
      mins.zip(maxs).map { case (lo, hi) => hi.toDouble - lo.toDouble }
  }

  /** Train = one aggregation: per-dimension min/max over the corpus.
    * The collect is dim rows (the model IS the small side — same
    * adjudication as PQ codebooks and IVF centroids).
    */
  def train(vectors: DataFrame): SqModel = {
    val rows = vectors
      .select(posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("d").agg(min("v").as("lo"), max("v").as("hi"))
      .orderBy("d").collect()
    require(rows.nonEmpty, "SQ training needs a non-empty corpus")
    SqModel(rows.map(_.getFloat(1)), rows.map(_.getFloat(2)))
  }

  /** Encode every vector to byte codes (stored int for relational
    * friendliness): (id, codes ARRAY<INT>). One in-row transform, no
    * shuffle.
    */
  def encode(vectors: DataFrame, model: SqModel): DataFrame = {
    val minsLit = array(model.mins.map(m => lit(m.toDouble)): _*)
    val scalesLit = array(model.scales.map(lit): _*)
    vectors.select(col("id"),
      zip_with(col("embedding"), sequence(lit(1), lit(model.dim)), (v, d) => {
        val lo = element_at(minsLit, d)
        val sc = element_at(scalesLit, d)
        when(sc === 0.0, lit(0)).otherwise(
          least(greatest(floor((v.cast("double") - lo) * lit(255.0) / sc),
            lit(0L)), lit(255L)).cast("int"))
      }).as("codes"))
  }

  /** Approximate-dot top-k over codes only: per query, weight vector
    * w_d = q_d * scale_d / 255 (driver-side, dim doubles), score =
    * Σ_d code_d * w_d as a strict left fold (deterministic), descending
    * bounded top-k. The constant Σ q_d·min_d is omitted — rank-invariant
    * within a query.
    */
  def searchAdc(
      codes: DataFrame, // (id, codes)
      model: SqModel,
      queries: Seq[(Int, Seq[Float])],
      k: Int): DataFrame = {
    val results = queries.map { case (qIdx, qVec) =>
      require(qVec.length == model.dim, s"query dim ${qVec.length} != ${model.dim}")
      val w = qVec.toArray.zip(model.scales).map { case (q, s) => q.toDouble * s / 255.0 }
      val wLit = array(w.map(lit): _*)
      val score = aggregate(
        zip_with(col("codes"), wLit, (c, wd) => c.cast("double") * wd),
        lit(0.0), (acc, x) => acc + x)
      codes
        .withColumn("adot", score)
        .withColumn("query_idx", lit(qIdx))
        .select("query_idx", "id", "adot")
        .orderBy(col("adot").desc, col("id").asc)
        .limit(k)
    }
    results.reduceOption(_ unionAll _).getOrElse(
      codes.withColumn("adot", lit(0.0)).withColumn("query_idx", lit(0))
        .select("query_idx", "id", "adot").limit(0))
  }

  /** ADC shortlist (k * oversample) + exact cosine re-rank — the serving
    * shape at scale, identical contract to [[Pq.searchAdcRerank]].
    */
  def searchAdcRerank(
      codes: DataFrame, // (id, codes)
      vectors: DataFrame, // (id, embedding, norm)
      model: SqModel,
      queries: Seq[(Int, Seq[Float])],
      k: Int,
      oversample: Int = 4): DataFrame =
    Pq.rerank(searchAdc(codes, model, queries, k * oversample), vectors, queries, k)
}
