package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term-statistics operators: per-document TF-IDF keyword
  * extraction and PMI collocation mining — the "what is this corpus
  * about" stats a curation pipeline reports next to its quality gates
  * (and the features classic BM25F/topic baselines start from).
  *
  * Scale shape: everything is keyed aggregation over the exploded token
  * stream — (doc, term) and (term) group-bys with map-side combine, one
  * corpus-wide single-row aggregate broadcast back for the N in IDF/PMI.
  * No corpus-sized window: per-document top-k partitions by doc_id
  * (bounded groups — a document's distinct terms), corpus-level top-k is
  * a TakeOrderedAndProject. Nothing here is all-pairs; collocations
  * count ADJACENT token pairs only (the training-data-scale analog of
  * full co-occurrence windows, which would be |doc|² per doc).
  */
object Keywords {

  /** Top-k terms per document by smoothed TF-IDF:
    * `tf(term, doc) * ln((N + 1) / (df(term) + 1))`, ties broken
    * lexically. Input: (id, toks: array&lt;string&gt;). Output:
    * (id, rank, term, tfidf).
    */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame = {
    val terms = docs.select(col("id"), explode(col("toks")).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("id")).as("n_docs"))
    // df is vocab-sized (not corpus-sized) but can still exceed broadcast
    // limits at 100 TB: leave the join strategy to AQE
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log((col("n_docs") + lit(1)).cast("double") / (col("df") + lit(1))))
    val w = Window.partitionBy("id").orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tfidf"))
  }

  /** Corpus-level top-k collocations (adjacent token bigrams) by pointwise
    * mutual information, `ln(c_ab * T² / (B * c_a * c_b))` with T = total
    * tokens, B = total bigrams, keeping bigrams seen ≥ `minCount` times.
    * Input: (id, toks). Output: (rank, w1, w2, pair_count, pmi).
    */
  def pmiCollocations(docs: DataFrame, k: Int, minCount: Long): DataFrame = {
    val toks = docs.select(col("id"), col("toks"))
    // adjacent pairs: zip toks with its own tail (slice is 1-based)
    val pairs = toks
      .select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val unigrams = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bigrams = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val totals = unigrams.agg(sum(col("c")).as("t_tok"))
      .crossJoin(bigrams.agg(sum(col("c_ab")).as("t_big")))
    val scored = bigrams
      .filter(col("c_ab") >= minCount)
      .join(unigrams.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(unigrams.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", log(
        col("c_ab").cast("double") * col("t_tok") * col("t_tok") /
          (col("t_big") * col("c_a") * col("c_b"))))
    // global top-k via TakeOrderedAndProject (orderBy + limit), then ranks
    // assigned on the ≤ k collected rows (the Mmr shortlist precedent): a
    // rank window here would be unpartitioned — the single-task sort
    // PlanSpec bans — and a rank self-join would recompute the corpus
    // aggregation twice
    val spark = docs.sparkSession
    import spark.implicits._
    val top = scored
      .select(col("w1"), col("w2"), col("c_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
      .collect()
      .sortBy(r => (-r.getDouble(3), r.getString(0), r.getString(1)))
    top.zipWithIndex.map { case (r, i) =>
      (i + 1, r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
    }.toSeq.toDF("rank", "w1", "w2", "pair_count", "pmi")
  }
}
