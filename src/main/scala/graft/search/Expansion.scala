package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Pseudo-relevance-feedback query expansion (Rocchio 1971; Lavrenko &
  * Croft 2001 relevance models; Abdul-Jaleel 2004 RM3 — simplified to an
  * integer-exact term-selection rule): serve the base BM25 query, mine
  * expansion terms from its top-R feedback documents, and re-serve BM25
  * over the union of original and expansion terms. The recall lever for
  * short queries against large corpora — vocabulary mismatch is the
  * dominant lexical-retrieval failure and PRF is its standard remedy.
  *
  * Expansion-term rule: candidate terms (the feedback docs' vocabulary
  * minus the query's own terms) rank by total feedback frequency DESC,
  * corpus document frequency ASC, term ASC; the top E join the query.
  * Deliberately integer-only: RM3's λ-weighted probability mixture
  * ranks by float products whose last-ulp ties are engine-dependent,
  * while (fbtf, df) captures the same "frequent in the feedback set,
  * rare in the corpus" signal bit-reproducibly.
  *
  * Scale shape: two ordinary BM25 serves (each one stats aggregate + one
  * scored scan with a bounded top-k heap) around a candidate-mining step
  * that explodes only the R feedback documents (KB-sized) and takes the
  * candidates' corpus dfs from ONE distinct-token scan probed by the
  * broadcast candidate list. Driver state: R ids + E terms.
  */
object Expansion {

  def expandedBm25(
      docs: DataFrame,
      queryIdx: Int,
      query: String,
      k: Int,
      feedbackDocs: Int = 10,
      expandTerms: Int = 5): DataFrame = {
    val orig = Lexical.tokenizeQuery(query)
    val fbIds = Lexical.searchBm25(docs, queryIdx, query, feedbackDocs)
      .select("id").collect().map(_.get(0)).toSeq
    if (fbIds.isEmpty || orig.isEmpty)
      return Lexical.searchBm25(docs, queryIdx, query, k)
    // candidate mining over the R feedback docs only (serving-bounded
    // literal list, like ivfTopK's driver-side probe selection)
    val fb = docs.filter(col("id").isin(fbIds: _*))
      .select(explode(tokens(col("content"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("fbtf"))
      .filter(!col("term").isin(orig: _*))
      .localCheckpoint()
    // corpus df for the candidates: one distinct-token scan, probe side
    // broadcast (candidates = vocabulary of R docs — KB-sized)
    val dfs = docs
      .select(explode(array_distinct(tokens(col("content")))).as("term"))
      .join(broadcast(fb.select("term")), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val exp = broadcast(fb).join(dfs, "term")
      .orderBy(col("fbtf").desc, col("df").asc, col("term").asc)
      .limit(expandTerms)
      .select("term").collect().map(_.getString(0)).toSeq
    Lexical.searchBm25(docs, queryIdx, (orig ++ exp).mkString(" "), k)
  }
}
