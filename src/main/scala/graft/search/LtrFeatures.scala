package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Learning-to-rank feature extraction — the step that turns a serving
  * shortlist into a ranking-model TRAINING TABLE (the LETOR layout:
  * one row per (query, candidate), one column per ranking signal).
  * Lexical signals only, all integer- or closed-form-exact so an oracle
  * replays every cell: BM25 (the serve's own score), matched-term
  * count, summed term frequency, document length, and the rarest
  * matched term's document frequency.
  *
  * Scale shape: the shortlist is the serve's bounded top-k (collected
  * ids are serving-bounded, like ivfTopK's probe selection); per-term
  * statistics come from the SAME one-pass corpus aggregate the serve
  * already computes; feature assembly touches only shortlist rows.
  */
object LtrFeatures {

  /** (query_idx, id, bm25, n_match, tf_sum, dl, df_min) for the BM25
    * top-`k` of `query`, ordered by the serve's rank. df_min is over
    * MATCHED terms only (0 when nothing matched — impossible for BM25
    * candidates, kept total for safety).
    */
  def features(
      docs: DataFrame,
      queryIdx: Int,
      query: String,
      k: Int): DataFrame = {
    val terms = Lexical.tokenizeQuery(query)
    require(terms.nonEmpty, "query tokenizes to nothing")
    val serve = Lexical.searchBm25(docs, queryIdx, query, k)
    val ids = serve.select("id").collect().map(_.get(0)).toSeq
    if (ids.isEmpty) return serve.select(col("query_idx"), col("id"),
      col("score").as("bm25"), lit(0).as("n_match"), lit(0L).as("tf_sum"),
      lit(0L).as("dl"), lit(0L).as("df_min"))
    // corpus df per term: the same one-pass aggregate shape the serve uses
    val toksC = col("__toks")
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(tf(toksC, lit(t)) > 0, 1L).otherwise(0L)).as(s"df_$i")
    }
    val dfRow = docs.select(tokens(col("content")).as("__toks"))
      .agg(dfAggs.head, dfAggs.tail: _*).collect()(0)
    val dfs = terms.indices.map(i => dfRow.getLong(i))
    // shortlist-only feature assembly
    val short = docs.filter(col("id").isin(ids: _*))
      .select(col("id"), tokens(col("content")).as("__toks"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      tf(toksC, lit(t)).cast("long").as(s"tf_$i")
    }
    val feats = short.select((col("id") +: size(toksC).cast("long")
      .as("dl") +: tfCols): _*)
      .withColumn("n_match",
        terms.indices.map(i => when(col(s"tf_$i") > 0, 1).otherwise(0))
          .reduce(_ + _))
      .withColumn("tf_sum",
        terms.indices.map(i => col(s"tf_$i")).reduce(_ + _))
      .withColumn("df_min",
        terms.indices.map(i =>
          when(col(s"tf_$i") > 0, lit(dfs(i))).otherwise(lit(Long.MaxValue)))
          .reduce((a, b) => least(a, b)))
      .withColumn("df_min",
        when(col("df_min") === Long.MaxValue, 0L).otherwise(col("df_min")))
    serve.select(col("query_idx"), col("id"), col("score").as("bm25"))
      .join(feats.select("id", "n_match", "tf_sum", "dl", "df_min"), "id")
      .select("query_idx", "id", "bm25", "n_match", "tf_sum", "dl", "df_min")
  }
}
