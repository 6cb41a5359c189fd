package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Answer-to-source attribution — the provenance step after a RAG
  * serve: for each answer sentence, which context document supports it?
  * Attribution = maximal word n-gram containment (the sentence's
  * distinct n-grams found in the candidate document), ties to the
  * smaller document id; sentences too short to form an n-gram emit
  * doc_id −1 with zero coverage. The same primitive audits training
  * data for quotation/derivation ("which source did this example come
  * from").
  *
  * Sentences arrive PRE-SPLIT ((answer_id, sent_idx, text)) — splitting
  * policy is a UI concern and punctuation regexes drift between
  * engines; the attribution math is the contract here.
  *
  * Scale shape: sentence n-grams explode answer-sized rows, context
  * n-grams context-sized ones; the match join is keyed on
  * (answer_id, gram) — candidates stay within each answer's own
  * shortlist, never across answers — and the argmax window partitions
  * by (answer_id, sent_idx), bounded by the shortlist size.
  */
object Attribution {

  /** (answer_id, sent_idx, doc_id, n_match, n_grams, coverage_ppm). */
  def attribute(
      sentences: DataFrame,
      contexts: DataFrame,
      n: Int = 3): DataFrame = {
    require(n >= 1 && n <= 8, s"n-gram size 1..8, got $n")
    // expr() can't reference a Column; project the token array first
    val sGrams = sentences
      .select(col("answer_id"), col("sent_idx"), tokens(col("text")).as("__t"))
      .select(col("answer_id"), col("sent_idx"),
        array_distinct(expr(
          // sequence(1, 0) DESCENDS in Spark, so the too-short case must
          // branch to an empty array instead of relying on an empty range
          s"case when size(__t) >= $n then " +
            s"transform(sequence(1, size(__t) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(__t, i, $n))) " +
            "else array() end")).as("__g"))
      .select(col("answer_id"), col("sent_idx"),
        size(col("__g")).as("n_grams"), col("__g"))
    val sExpl = sGrams
      .select(col("answer_id"), col("sent_idx"), col("n_grams"),
        explode(col("__g")).as("g"))
    val cGrams = contexts
      .select(col("answer_id"), col("doc_id"), tokens(col("content")).as("__t"))
      .select(col("answer_id"), col("doc_id"),
        explode(array_distinct(expr(
          s"case when size(__t) >= $n then " +
            s"transform(sequence(1, size(__t) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(__t, i, $n))) " +
            "else array() end"))).as("g"))
    val matches = sExpl
      .join(cGrams, Seq("answer_id", "g"))
      .groupBy("answer_id", "sent_idx", "n_grams", "doc_id")
      .agg(count(lit(1)).as("n_match"))
    val w = Window.partitionBy("answer_id", "sent_idx")
      .orderBy(col("n_match").desc, col("doc_id").asc)
    val best = matches
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("answer_id"), col("sent_idx"), col("doc_id"),
        col("n_match"), col("n_grams"))
    sGrams.select("answer_id", "sent_idx", "n_grams")
      .join(best, Seq("answer_id", "sent_idx", "n_grams"), "left")
      .select(col("answer_id"), col("sent_idx"),
        coalesce(col("doc_id"), lit(-1L)).as("doc_id"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        col("n_grams").cast("long").as("n_grams"),
        when(col("n_grams") === 0, 0L)
          .otherwise(expr("coalesce(n_match, 0) * 1000000 div n_grams"))
          .as("coverage_ppm"))
  }
}
