package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-vocabulary spelling correction via deletion-neighborhood
  * blocking (Garbe's SymSpell scheme — public algorithm): a pair of
  * strings within edit distance d always shares at least one common
  * variant reachable by deleting ≤ d characters from each side, so
  * joining the query terms' delete variants against the vocabulary's
  * delete variants yields a complete candidate set WITHOUT comparing the
  * query to every vocabulary entry; candidates then verify with the
  * exact banded Levenshtein. The standard query-time companion to the
  * lexical search family (vector_mcp.py's tokenizer feeds both sides,
  * so corrections are always in serving vocabulary).
  *
  * Scale shape: the vocabulary is one corpus token pass collapsed to
  * |V| rows; its delete expansion is vocab-sized (~L²/2 variants per
  * term), never corpus-sized, and the handful of query terms broadcast
  * their variants. The verify runs on the blocked candidate set only;
  * the rank window partitions by query term (bounded).
  */
object Spell {

  /** All distinct strings reachable from `s` by deleting up to `maxDist`
    * characters — including `s` itself (the distance-0 variant).
    */
  private[graft] def deletes(s: String, maxDist: Int): Seq[String] = {
    var frontier = Set(s)
    val all = scala.collection.mutable.LinkedHashSet(s)
    var d = 0
    while (d < maxDist) {
      frontier = frontier.flatMap(t =>
        (0 until t.length).map(i => t.substring(0, i) + t.substring(i + 1)))
      all ++= frontier
      d += 1
    }
    all.toSeq
  }

  /** Top-`topK` corrections per query term: (term, rank, suggestion,
    * dist, freq) ranked by (dist ASC, document frequency DESC,
    * suggestion ASC). `docs` needs a `content` column; frequency is the
    * tokenizer's document frequency (tokens() dedupes within a doc).
    * Proven equal to brute-force Levenshtein over the vocabulary
    * (SpellSpec).
    */
  def corrections(
      docs: DataFrame,
      terms: Seq[String],
      maxDist: Int = 2,
      topK: Int = 3): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(maxDist >= 1 && maxDist <= 3, s"maxDist 1..3, got $maxDist")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs
      .select(explode(distinctTokens(col("content"))).as("suggestion"))
      .groupBy("suggestion").agg(count(lit(1)).as("freq"))
    val delUdf = udf((t: String) => deletes(t, maxDist))
    val vocabKeys = vocab.select(col("suggestion"), col("freq"),
      explode(delUdf(col("suggestion"))).as("k"))
    val queryKeys = terms.distinct
      .flatMap(t => deletes(t, maxDist).map(k => (t, k)))
      .toDF("term", "k")
    // a candidate pair shares one delete key per... potentially many —
    // dedupe on the pair before the (more expensive) exact verify
    val cand = vocabKeys.join(broadcast(queryKeys), "k")
      .select("term", "suggestion", "freq").distinct()
    val verified = cand
      .withColumn("dist",
        levenshtein(col("term"), col("suggestion"), maxDist))
      .filter(col("dist") >= 0) // banded form returns -1 past the cap
    val w = Window.partitionBy("term")
      .orderBy(col("dist").asc, col("freq").desc, col("suggestion").asc)
    verified
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("term", "rank", "suggestion", "dist", "freq")
  }
}
